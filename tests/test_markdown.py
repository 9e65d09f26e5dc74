"""Markdown conversion tests. Expectations are hand-computed from the
public Turndown algorithm with the reference's configuration: default
options (setext headings, '*' bullets, indented code, '_' em), the
@joplin/turndown-plugin-gfm table/strikethrough rules, and the custom
inlineLink rule with its trailing newline (html-to-markdown.ts:37-51),
followed by firecrawl-rs post-processing (html.rs:917-998)."""

from webcrawl_spark.kernels.markdown import html_to_markdown, post_process_markdown


def md(html: str) -> str:
    return html_to_markdown(html)


class TestBasics:
    def test_paragraph(self):
        assert md("<p>Hello world</p>") == "Hello world"

    def test_two_paragraphs(self):
        assert md("<p>One</p><p>Two</p>") == "One\n\nTwo"

    def test_setext_h1(self):
        assert md("<h1>Title</h1>") == "Title\n====="

    def test_setext_h2(self):
        assert md("<h2>Sub</h2>") == "Sub\n---"

    def test_atx_h3(self):
        assert md("<h3>Deep</h3>") == "### Deep"

    def test_em_strong(self):
        assert md("<p><em>it</em> and <strong>bold</strong></p>") == "_it_ and **bold**"

    def test_br(self):
        assert md("<p>a<br>b</p>") == "a  \nb"

    def test_hr(self):
        assert md("<p>a</p><hr><p>b</p>") == "a\n\n* * *\n\nb"

    def test_blockquote(self):
        assert md("<blockquote><p>quoted</p></blockquote>") == "> quoted"

    def test_inline_code(self):
        assert md("<p>run <code>ls -la</code> now</p>") == "run `ls -la` now"

    def test_indented_code_block(self):
        assert md("<pre><code>line1\nline2</code></pre>") == "    line1\n    line2"

    def test_escaping(self):
        assert md("<p>a*b_c[d]</p>") == "a\\*b\\_c\\[d\\]"

    def test_whitespace_collapse(self):
        assert md("<p>a\n   b\t c</p>") == "a b c"


class TestLinks:
    # custom inlineLink rule: trailing \n after every link
    def test_simple_link(self):
        assert md('<p><a href="https://e.com/x">text</a></p>') == "[text](https://e.com/x)"

    def test_link_trailing_newline_inline(self):
        assert (
            md('<p>See <a href="https://e.com/">here</a> for more</p>')
            == "See [here](https://e.com/)\n for more"
        )

    def test_link_with_title(self):
        assert (
            md('<p><a href="https://e.com/" title="My Title">t</a></p>')
            == '[t](https://e.com/ "My Title")'
        )

    def test_content_trimmed(self):
        assert md('<p><a href="https://e.com/x"> padded </a></p>') == "[padded](https://e.com/x)"

    def test_image(self):
        assert md('<p><img src="https://e.com/i.png" alt="pic"></p>') == "![pic](https://e.com/i.png)"


class TestLists:
    def test_unordered(self):
        assert md("<ul><li>one</li><li>two</li></ul>") == "*   one\n*   two"

    def test_ordered(self):
        assert md("<ol><li>first</li><li>second</li></ol>") == "1.  first\n2.  second"

    def test_ordered_with_start(self):
        assert md('<ol start="3"><li>a</li><li>b</li></ol>') == "3.  a\n4.  b"

    def test_nested(self):
        assert (
            md("<ul><li>top<ul><li>inner</li></ul></li></ul>")
            == "*   top\n    *   inner"
        )

    def test_task_list(self):
        assert (
            md('<ul><li><input type="checkbox" checked>done</li>'
               '<li><input type="checkbox">todo</li></ul>')
            == "*   [x] done\n*   [ ] todo"
        )


class TestGfm:
    def test_strikethrough(self):
        assert md("<p><del>gone</del></p>") == "~~gone~~"

    def test_simple_table(self):
        html = (
            "<table><thead><tr><th>Name</th><th>Age</th></tr></thead>"
            "<tbody><tr><td>Ann</td><td>30</td></tr>"
            "<tr><td>Bob</td><td>4</td></tr></tbody></table>"
        )
        assert md(html) == (
            "| Name | Age |\n"
            "| --- | --- |\n"
            "| Ann | 30  |\n"
            "| Bob | 4   |"
        )

    def test_headerless_table_gets_empty_header(self):
        html = (
            "<table><tbody><tr><td>aaa</td><td>bbb</td></tr>"
            "<tr><td>ccc</td><td>ddd</td></tr></tbody></table>"
        )
        assert md(html) == (
            "|     |     |\n"
            "| --- | --- |\n"
            "| aaa | bbb |\n"
            "| ccc | ddd |"
        )

    def test_cell_pipe_escaped(self):
        html = (
            "<table><thead><tr><th>Col</th><th>Two</th></tr></thead>"
            "<tbody><tr><td>a|b</td><td>ccc</td></tr></tbody></table>"
        )
        assert "a\\|b" in md(html)


class TestPostProcess:
    def test_newline_in_link_text_escaped(self):
        assert post_process_markdown("[a\nb](x)") == "[a\\\nb](x)"

    def test_skip_to_content_removed(self):
        assert post_process_markdown("[Skip to Content](#main)Hello") == "Hello"

    def test_skip_link_case_insensitive(self):
        assert post_process_markdown("[skip to content](#x)Hi") == "Hi"

    def test_skip_link_non_fragment_kept(self):
        assert post_process_markdown("[Skip to Content](/page)") == "[Skip to Content](/page)"

    def test_bracket_counter_nested(self):
        assert post_process_markdown("[[a\nb]](x)") == "[[a\\\nb]](x)"


class TestEmptyRetrySupport:
    def test_empty_input(self):
        assert md("") == ""

    def test_blank_div(self):
        assert md("<div></div>") == ""
