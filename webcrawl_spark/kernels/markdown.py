"""HTML → Markdown converter reproducing the reference's Turndown pipeline.

The reference converts with the public `turndown` npm package (commonmark
rules, default options) + the `@joplin/turndown-plugin-gfm` plugin + one
custom ``inlineLink`` rule, then post-processes (apps/WebCrawl/src/lib/
html-to-markdown.ts:6-65, packages/firecrawl-rs/src/html.rs:917-998).

This module re-implements that conversion from the published Turndown
algorithm (public source, MIT): DOM whitespace collapse, per-node rules,
newline-joining, flanking-whitespace lifting, markdown escaping — with
Turndown's default options (headingStyle=setext, hr='* * *',
bulletListMarker='*', codeBlockStyle=indented, emDelimiter='_',
strongDelimiter='**', br='  ') and the GFM strikethrough/table/taskList
rules. The custom inlineLink rule emits
``[content.trim()](href.trim() "title")\\n`` — note the trailing newline
(html-to-markdown.ts:44-48).

post_process_markdown (html.rs:917-998): escape newlines inside [...] link
text as ``\\\\n`` via a bracket counter, then strip ``[Skip to Content](#…)``
links (ASCII case-insensitive label).
"""

from __future__ import annotations

import re

from .dom import Comment, Document, Element, Text, parse_html

__all__ = ["html_to_markdown", "post_process_markdown", "markdown_from_dom"]

BLOCK_ELEMENTS = frozenset({
    "address", "article", "aside", "audio", "blockquote", "body", "canvas",
    "center", "dd", "dir", "div", "dl", "dt", "fieldset", "figcaption",
    "figure", "footer", "form", "frameset", "h1", "h2", "h3", "h4", "h5",
    "h6", "header", "hgroup", "hr", "html", "isindex", "li", "main", "menu",
    "nav", "noframes", "noscript", "ol", "output", "p", "pre", "section",
    "table", "tbody", "td", "tfoot", "th", "thead", "tr", "ul",
})
VOID_ELEMENTS = frozenset({
    "area", "base", "br", "col", "command", "embed", "hr", "img", "input",
    "keygen", "link", "meta", "param", "source", "track", "wbr",
})
MEANINGFUL_WHEN_BLANK = frozenset({
    "a", "table", "thead", "tbody", "tfoot", "th", "td", "iframe", "script",
    "audio", "video",
})

OPTIONS = {
    "headingStyle": "setext",
    "hr": "* * *",
    "bulletListMarker": "*",
    "codeBlockStyle": "indented",
    "emDelimiter": "_",
    "strongDelimiter": "**",
    "br": "  ",
}

# Turndown's escape patterns (turndown.js `escapes`), applied in order.
_ESCAPES: list[tuple[re.Pattern[str], str]] = [
    (re.compile(r"\\"), r"\\\\"),
    (re.compile(r"\*"), r"\\*"),
    (re.compile(r"^-"), r"\\-"),
    (re.compile(r"^\+ "), r"\\+ "),
    (re.compile(r"^(=+)"), r"\\\1"),
    (re.compile(r"^(#{1,6}) "), r"\\\1 "),
    (re.compile(r"`"), r"\\`"),
    (re.compile(r"^~~~"), r"\\~~~"),
    (re.compile(r"\["), r"\\["),
    (re.compile(r"\]"), r"\\]"),
    (re.compile(r"^>"), r"\\>"),
    (re.compile(r"_"), r"\\_"),
    (re.compile(r"^(\d+)\. "), r"\1\\. "),
]


# cheap pre-check: if a text node contains none of the characters any escape
# rule could fire on, skip the 13 substitutions (the common case)
_ESCAPE_TRIGGER = re.compile(r"[\\*`\[\]_~#>=+.-]")


def _escape(text: str) -> str:
    if not _ESCAPE_TRIGGER.search(text):
        return text
    for pattern, repl in _ESCAPES:
        text = pattern.sub(repl, text)
    return text


def _is_block(node) -> bool:
    return isinstance(node, Element) and node.tag in BLOCK_ELEMENTS


def _is_void(node) -> bool:
    return isinstance(node, Element) and node.tag in VOID_ELEMENTS


def _is_pre(node) -> bool:
    return isinstance(node, Element) and node.tag == "pre"


def _is_code(node) -> bool:
    while node is not None:
        if isinstance(node, Element) and node.tag == "code":
            return True
        node = node.parent
    return False


def _has_descendant(node: Element, pred) -> bool:
    return any(pred(d) for d in node.descendants())


def _is_blank(node) -> bool:
    """turndown utilities.js isBlank."""
    if _is_void(node):
        return False
    if isinstance(node, Element) and node.tag in MEANINGFUL_WHEN_BLANK:
        return False
    text = node.text_contents()
    if re.search(r"\S", text):
        return False
    if isinstance(node, Element):
        if _has_descendant(node, _is_void):
            return False
        if _has_descendant(
            node,
            lambda d: isinstance(d, Element) and d.tag in MEANINGFUL_WHEN_BLANK,
        ):
            return False
    return True


# --- whitespace collapse (turndown collapse-whitespace) ---------------------

def _collapse_whitespace(root: Element) -> None:
    """Port of collapse-whitespace.js over our DOM (mutates the tree)."""

    def next_node(prev, current):
        if (prev is not None and prev.parent is current) or _is_pre(current):
            # skip children: next sibling or climb
            node = current
            while node is not None and node is not root:
                parent = node.parent
                if parent is None:
                    return None
                idx = parent.children.index(node)
                if idx + 1 < len(parent.children):
                    return parent.children[idx + 1]
                node = parent
            return None
        if isinstance(current, Element) and current.children:
            return current.children[0]
        node = current
        while node is not None and node is not root:
            parent = node.parent
            if parent is None:
                return None
            idx = parent.children.index(node)
            if idx + 1 < len(parent.children):
                return parent.children[idx + 1]
            node = parent
        return None

    def remove(node):
        # turndown: next = node.nextSibling || node.parentNode, then unlink
        parent = node.parent
        idx = parent.children.index(node)
        sibling = parent.children[idx + 1] if idx + 1 < len(parent.children) else None
        node.detach()
        return sibling if sibling is not None else parent

    prev_text: Text | None = None
    keep_leading_ws = False
    prev = None
    node = next_node(prev, root)
    while node is not None and node is not root:
        if isinstance(node, Text):
            text = re.sub(r"[ \r\n\t]+", " ", node.data)
            if (
                (prev_text is None or prev_text.data.endswith(" "))
                and not keep_leading_ws
                and text.startswith(" ")
            ):
                text = text[1:]
            if not text:
                node = remove(node)
                continue
            node.data = text
            prev_text = node
        elif isinstance(node, Element):
            if _is_block(node) or node.tag == "br":
                if prev_text is not None:
                    prev_text.data = re.sub(r" $", "", prev_text.data)
                prev_text = None
                keep_leading_ws = False
            elif _is_void(node) or _is_pre(node):
                prev_text = None
                keep_leading_ws = True
            elif prev_text is not None:
                keep_leading_ws = False
        else:  # comments etc. removed
            node = remove(node)
            continue
        nxt = next_node(prev, node)
        prev = node
        node = nxt
    if prev_text is not None:
        prev_text.data = re.sub(r" $", "", prev_text.data)
        if not prev_text.data:
            prev_text.detach()


# --- rules -------------------------------------------------------------------

def _clean_attribute(value: str | None) -> str:
    return re.sub(r"(\n+\s*)+", "\n", value) if value else ""


def _index_in_parent_elements(node: Element) -> int:
    return node.parent.element_children().index(node)


def _is_heading_row(tr: Element | None) -> bool:
    """@joplin/turndown-plugin-gfm tables.js isHeadingRow: any tr inside a
    thead; or the first row of the table (or of a first tbody) whose cells
    are all th."""
    if tr is None:
        return False
    parent = tr.parent
    if parent is None:
        return False
    if parent.tag == "thead":
        return True
    first = parent.element_children()[0] if parent.element_children() else None
    if first is not tr:
        return False
    if parent.tag == "table" or _is_first_tbody(parent):
        cells = tr.element_children()
        return bool(cells) and all(c.tag == "th" for c in cells)
    return False


def _is_first_tbody(el: Element) -> bool:
    if el.tag != "tbody" or el.parent is None:
        return False
    siblings = el.parent.element_children()
    idx = siblings.index(el)
    if idx == 0:
        return True
    prev = siblings[idx - 1]
    return prev.tag == "thead" and not prev.text_contents().strip()


def _table_of(node: Element) -> Element | None:
    cur = node.parent
    while cur is not None and cur.tag != "table":
        cur = cur.parent
    return cur


def _table_rows(table: Element) -> list[Element]:
    rows: list[Element] = []
    for c in table.element_children():
        if c.tag == "tr":
            rows.append(c)
        elif c.tag in ("thead", "tbody", "tfoot"):
            rows.extend(r for r in c.element_children() if r.tag == "tr")
    return rows


def _table_col_count(table: Element) -> int:
    return max(
        (len([c for c in r.element_children() if c.tag in ("th", "td")])
         for r in _table_rows(table)),
        default=0,
    )


def _table_should_be_skipped(table: Element | None) -> bool:
    """Joplin tables.js: skip missing/empty tables, single-cell tables, and
    tables containing nested tables."""
    if table is None:
        return True
    rows = _table_rows(table)
    if not rows:
        return True
    if len(rows) == 1 and len(rows[0].element_children()) <= 1:
        return True
    for d in table.descendants():
        if isinstance(d, Element) and d.tag == "table":
            return True
    return False


def _cell(content: str, node: Element | None, index: int | None = None) -> str:
    """Joplin tables.js cell(): trim, newline→<br>, escape pipes, pad to a
    3-char minimum."""
    if index is None:
        assert node is not None
        index = _index_in_parent_elements(node)
    prefix = "| " if index == 0 else " "
    filtered = content.strip().replace("\n\r", "<br>").replace("\n", "<br>")
    filtered = re.sub(r"\|+", r"\\|", filtered)
    while len(filtered) < 3:
        filtered += " "
    return prefix + filtered + " |"


class _Converter:
    def __init__(self) -> None:
        self.options = OPTIONS

    # -- main entry
    def convert(self, root: Element) -> str:
        _collapse_whitespace(root)
        output = self._process(root)
        # turndown postProcess trim
        output = re.sub(r"^[\t\r\n]+", "", output)
        output = re.sub(r"[\t\r\n\s]+$", "", output)
        return output

    # -- node dispatch
    def _process(self, parent: Element) -> str:
        output = ""
        for child in list(parent.children):
            if isinstance(child, Text):
                replacement = (
                    child.data if _is_code(child.parent) else _escape(child.data)
                )
            elif isinstance(child, Element):
                replacement = self._replacement_for(child)
            else:
                replacement = ""
            output = _join(output, replacement)
        return output

    def _replacement_for(self, node: Element) -> str:
        content = self._process(node)
        leading, trailing = _flanking_whitespace(node)
        if leading or trailing:
            content = content.strip()
        return leading + self._apply_rule(node, content) + trailing

    # -- rule selection (order mirrors turndown: blank → added rules
    #    (inlineLink override, gfm) → commonmark → default)
    def _apply_rule(self, node: Element, content: str) -> str:
        tag = node.tag

        if _is_blank(node):
            # blankRule
            return "\n\n" if _is_block(node) else ""

        # custom inlineLink rule (html-to-markdown.ts:37-51) — overrides the
        # default link rule by key, checked with the added rules first
        if tag == "a" and node.get("href"):
            href = (node.get("href") or "").strip()
            title = node.get("title")
            title_part = f' "{title}"' if title else ""
            return f"[{content.strip()}]({href}{title_part})\n"

        # gfm strikethrough
        if tag in ("del", "s", "strike"):
            return f"~~{content}~~"

        # gfm taskListItems
        if (
            tag == "input"
            and (node.get("type") or "").lower() == "checkbox"
            and node.parent is not None
            and node.parent.tag == "li"
        ):
            return ("[x] " if node.get("checked") is not None else "[ ] ")

        # gfm tables (@joplin/turndown-plugin-gfm tables.js)
        if tag in ("th", "td"):
            if _table_should_be_skipped(_table_of(node)):
                return content
            return _cell(content, node)
        if tag == "tr":
            table = _table_of(node)
            if _table_should_be_skipped(table):
                return content
            border_cells = ""
            align_map = {"left": ":--", "right": "--:", "center": ":-:"}
            if _is_heading_row(node):
                col_count = _table_col_count(table)
                cells = node.element_children()
                for i in range(col_count):
                    cell_el = cells[i] if i < len(cells) else None
                    border = "---"
                    if cell_el is not None:
                        align = (cell_el.get("align") or "").lower()
                        if align:
                            border = align_map.get(align, border)
                    border_cells += _cell(border, cell_el, i)
            return "\n" + content + ("\n" + border_cells if border_cells else "")
        if tag == "table":
            if _table_should_be_skipped(node):
                return content
            content = re.sub(r"\n+", "\n", content)
            # synthesize an empty header when the second line isn't a divider
            lines = content.strip().split("\n")
            second_line = lines[1] if len(lines) >= 2 else ""
            second_is_divider = re.search(r"\| :?-+:? \|", second_line) is not None
            col_count = _table_col_count(node)
            empty_header = ""
            if col_count and not second_is_divider:
                empty_header = (
                    "|" + "     |" * col_count + "\n" + "|" + " --- |" * col_count
                )
            return "\n\n" + empty_header + content + "\n\n"
        if tag in ("thead", "tbody", "tfoot"):
            return content

        # commonmark rules
        if tag == "p":
            return f"\n\n{content}\n\n"
        if tag == "br":
            return self.options["br"] + "\n"
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            level = int(tag[1])
            if self.options["headingStyle"] == "setext" and level < 3:
                underline = ("=" if level == 1 else "-") * len(content)
                return f"\n\n{content}\n{underline}\n\n"
            return "\n\n" + "#" * level + f" {content}\n\n"
        if tag == "blockquote":
            inner = re.sub(r"^\n+|\n+$", "", content)
            inner = re.sub(r"^", "> ", inner, flags=re.MULTILINE)
            return f"\n\n{inner}\n\n"
        if tag in ("ul", "ol"):
            parent = node.parent
            if (
                parent is not None
                and parent.tag == "li"
                and parent.element_children()
                and parent.element_children()[-1] is node
            ):
                return "\n" + content
            return f"\n\n{content}\n\n"
        if tag == "li":
            inner = re.sub(r"^\n+", "", content)
            inner = re.sub(r"\n+$", "\n", inner)
            inner = inner.replace("\n", "\n    ")
            prefix = self.options["bulletListMarker"] + "   "
            parent = node.parent
            if parent is not None and parent.tag == "ol":
                start = parent.get("start")
                index = _index_in_parent_elements(node)
                number = (int(start) + index) if start and start.isdigit() else index + 1
                prefix = f"{number}.  "
            suffix = ""
            siblings = parent.children if parent is not None else []
            idx = siblings.index(node)
            has_next = idx + 1 < len(siblings)
            if has_next and not inner.endswith("\n"):
                suffix = "\n"
            return prefix + inner + suffix
        if tag == "pre":
            first = node.children[0] if node.children else None
            if (
                isinstance(first, Element)
                and first.tag == "code"
                and self.options["codeBlockStyle"] == "indented"
            ):
                code_text = first.text_contents()
                return "\n\n    " + code_text.replace("\n", "\n    ") + "\n\n"
            # fall through to default block handling
        if tag == "hr":
            return "\n\n" + self.options["hr"] + "\n\n"
        if tag in ("em", "i"):
            if not content.strip():
                return ""
            d = self.options["emDelimiter"]
            return f"{d}{content}{d}"
        if tag in ("strong", "b"):
            if not content.strip():
                return ""
            d = self.options["strongDelimiter"]
            return f"{d}{content}{d}"
        if tag == "code":
            parent = node.parent
            has_siblings = parent is not None and (
                len(parent.children) > 1
            )
            is_code_block = parent is not None and parent.tag == "pre" and not has_siblings
            if not is_code_block:
                if not content:
                    return ""
                inner = re.sub(r"\r?\n|\r", " ", content)
                extra = " " if re.search(r"^`|^ .*?[^ ].* $|`$", inner) else ""
                delimiter = "`"
                matches = re.findall(r"`+", inner)
                while delimiter in matches:
                    delimiter += "`"
                return delimiter + extra + inner + extra + delimiter
        if tag == "img":
            alt = _clean_attribute(node.get("alt"))
            src = node.get("src") or ""
            title = _clean_attribute(node.get("title"))
            title_part = f' "{title}"' if title else ""
            return f"![{alt}]({src}{title_part})" if src else ""

        # default rule
        return f"\n\n{content}\n\n" if _is_block(node) else content


def _join(left: str, right: str) -> str:
    s1 = left.rstrip("\n")
    s2 = right.lstrip("\n")
    nls = max(len(left) - len(s1), len(right) - len(s2))
    return s1 + "\n\n"[:nls] + s2


_EDGE_WS_RE = re.compile(
    r"^(([ \t\r\n]*)(\s*))(?:(?=\S)[\s\S]*\S)?((\s*?)([ \t\r\n]*))$"
)


def _flanking_whitespace(node: Element) -> tuple[str, str]:
    if _is_block(node):
        return "", ""
    text = node.text_contents()
    m = _EDGE_WS_RE.match(text)
    if m is None:
        return "", ""
    leading, leading_ascii, leading_non_ascii = m.group(1), m.group(2), m.group(3)
    trailing, trailing_non_ascii, trailing_ascii = m.group(4), m.group(5), m.group(6)
    if leading_ascii and _is_flanked_by_whitespace(node, left=True):
        leading = leading_non_ascii
    if trailing_ascii and _is_flanked_by_whitespace(node, left=False):
        trailing = trailing_non_ascii
    return leading, trailing


def _is_flanked_by_whitespace(node: Element, left: bool) -> bool:
    parent = node.parent
    if parent is None:
        return False
    idx = parent.children.index(node)
    sibling = (
        parent.children[idx - 1] if left and idx > 0
        else parent.children[idx + 1] if not left and idx + 1 < len(parent.children)
        else None
    )
    if sibling is None:
        return False
    if isinstance(sibling, Text):
        return sibling.data.endswith(" ") if left else sibling.data.startswith(" ")
    if isinstance(sibling, Element) and not _is_block(sibling):
        text = sibling.text_contents()
        return text.endswith(" ") if left else text.startswith(" ")
    return False


def markdown_from_dom(root: Element) -> str:
    return _Converter().convert(root)


def html_to_markdown(html: str) -> str:
    """parseMarkdown (html-to-markdown.ts:6-65): Turndown conversion +
    firecrawl-rs post-processing. Empty input → ''."""
    if not html:
        return ""
    doc = parse_html(html)
    body = doc.body
    if body is None:
        return ""
    md = markdown_from_dom(body)
    return post_process_markdown(md)


_BRACKET_SPLIT = re.compile(r"([\[\]])")
# html.rs:957-998 — [Skip to Content](#...) with ASCII case-insensitive
# label; unclosed parens never match (kept, like the reference scanner)
_SKIP_LINK_RE = re.compile(r"\[skip to content\]\(#[^)]*\)", re.IGNORECASE)


def post_process_markdown(markdown: str) -> str:
    """html.rs:917-955 bracket-newline escaping (token-wise bracket-depth
    scan, equivalent to the reference's char loop) + skip-link removal."""
    if "[" in markdown:
        depth = 0
        out: list[str] = []
        for token in _BRACKET_SPLIT.split(markdown):
            if token == "[":
                depth += 1
                out.append(token)
            elif token == "]":
                depth = max(0, depth - 1)
                out.append(token)
            elif depth > 0 and "\n" in token:
                out.append(token.replace("\n", "\\\n"))
            else:
                out.append(token)
        markdown = "".join(out)
        markdown = _SKIP_LINK_RE.sub("", markdown)
    return markdown
