"""The frozen golden corpus (FIXTURES.md §2): construct-focused HTML pages
whose expected cleaned-markdown output is computed ONCE (scripts/
freeze_goldens.py), reviewed, and committed under tests/goldens/. The
byte-identity regression test asserts kernel output equals the frozen bytes
— any kernel change that shifts extraction output fails loudly."""

CORPUS: dict[str, tuple[str, str]] = {
    # name: (page_url, html)
    "headings_setext": (
        "https://g.example.com/h",
        "<body><main><h1>Top Title</h1><h2>Second</h2><h3>Third</h3>"
        "<p>body text</p></main></body>",
    ),
    "links_inline_rule": (
        "https://g.example.com/links",
        '<body><p>See <a href="/rel">relative</a> and '
        '<a href="https://x.com/a" title="T">titled</a> links.</p></body>',
    ),
    "multiline_link_text": (
        "https://g.example.com/ml",
        '<body><p><a href="/x">line one<br>line two</a></p></body>',
    ),
    "skip_to_content": (
        "https://g.example.com/skip",
        '<body><a href="#main">Skip to Content</a><p>Real content</p></body>',
    ),
    "lists_nested": (
        "https://g.example.com/lists",
        "<body><ul><li>alpha<ul><li>inner</li></ul></li><li>beta</li></ul>"
        '<ol start="5"><li>five</li><li>six</li></ol></body>',
    ),
    "gfm_table": (
        "https://g.example.com/table",
        "<body><table><thead><tr><th>Name</th><th align=\"right\">N</th></tr>"
        "</thead><tbody><tr><td>a|b</td><td>1</td></tr>"
        "<tr><td>c</td><td>22</td></tr></tbody></table></body>",
    ),
    "code_blocks": (
        "https://g.example.com/code",
        "<body><p>inline <code>x = `y`</code> code</p>"
        "<pre><code>def f():\n    return 1</code></pre></body>",
    ),
    "blockquote_em_strong": (
        "https://g.example.com/q",
        "<body><blockquote><p>quoted <em>em</em> and <strong>st</strong>"
        "</p></blockquote><hr><p>after <del>gone</del></p></body>",
    ),
    "boilerplate_removal": (
        "https://g.example.com/bp",
        '<body><header>HEAD</header><nav>NAV</nav><div class="sidebar">S</div>'
        "<main><p>kept content</p></main>"
        '<div class="cookie">cookies!</div><footer>FOOT</footer></body>',
    ),
    "force_include_main": (
        "https://g.example.com/fi",
        '<body><header><div id="main"><p>protected</p></div></header></body>',
    ),
    "empty_main_retry": (
        "https://g.example.com/empty",
        "<body><nav><p>only nav text here</p></nav></body>",
    ),
    "base_href_absolutize": (
        "https://g.example.com/dir/page",
        '<head><base href="/other/"></head>'
        '<body><p><a href="x">lnk</a><img src="i.png" alt="im"></p></body>',
    ),
    "srcset_best": (
        "https://g.example.com/img",
        '<body><p><img srcset="s.png 480w, l.png 1024w" src="f.png" alt="p">'
        "</p></body>",
    ),
    "escaping": (
        "https://g.example.com/esc",
        "<body><p>star*under_bracket[x] 1. list-ish # head-ish</p></body>",
    ),
    "entities_nbsp": (
        "https://g.example.com/ent",
        "<body><p>a&amp;b &lt;tag&gt; nb&nbsp;sp &quot;q&quot;</p></body>",
    ),
    "task_list": (
        "https://g.example.com/task",
        '<body><ul><li><input type="checkbox" checked>done</li>'
        '<li><input type="checkbox">open</li></ul></body>',
    ),
}
