"""A small HTML DOM for the extraction kernels: stdlib-parser-based tree,
CSS-selector subset, and an html5ever-style serializer.

The reference parses HTML with kuchikiki/html5ever (Rust) and cheerio (TS);
neither is available here, and no third-party HTML parser is installed in the
runtime, so this module provides just enough DOM for the operators the
reference applies (select by tag/class/id/attr, detach, append, attribute
edits, text contents, serialize). The synthetic corpus is well-formed HTML,
so full html5 tree-construction error recovery is not required; common
implied-end-tag cases (<li>, <p>, table cells) are handled.

Serialization mirrors html5ever's: attributes double-quoted in insertion
order with &/"/nbsp escaped; text with &/</>/nbsp escaped; raw text inside
script/style; void elements self-closing-less.
"""

from __future__ import annotations

from html.parser import HTMLParser

__all__ = ["Element", "Text", "Comment", "Document", "parse_html"]

VOID_ELEMENTS = frozenset({
    "area", "base", "br", "col", "command", "embed", "hr", "img", "input",
    "keygen", "link", "meta", "param", "source", "track", "wbr",
})
RAW_TEXT_ELEMENTS = frozenset({"script", "style"})
HEAD_ELEMENTS = frozenset({"base", "link", "meta", "title", "style", "script", "noscript"})

# Implied end tags: starting <key> closes an open <value-set> sibling.
_CLOSES = {
    "li": {"li"},
    "p": {"p"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "tr": {"tr", "td", "th"},
    "thead": {"tr", "td", "th"},
    "tbody": {"thead", "tr", "td", "th"},
    "tfoot": {"tbody", "tr", "td", "th"},
    "dd": {"dd", "dt"},
    "dt": {"dd", "dt"},
    "option": {"option"},
}
_BLOCKISH_CLOSES_P = frozenset({
    "address", "article", "aside", "blockquote", "div", "dl", "fieldset",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header",
    "hr", "main", "nav", "ol", "p", "pre", "section", "table", "ul",
})


class Node:
    __slots__ = ("parent",)

    def __init__(self) -> None:
        self.parent: Element | None = None

    def detach(self) -> None:
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None

    def text_contents(self) -> str:
        return ""


class Text(Node):
    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        super().__init__()
        self.data = data

    def text_contents(self) -> str:
        return self.data

    def __repr__(self) -> str:
        return f"Text({self.data!r})"


class Comment(Node):
    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        super().__init__()
        self.data = data

    def __repr__(self) -> str:
        return f"Comment({self.data!r})"


class Element(Node):
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None) -> None:
        super().__init__()
        self.tag = tag
        self.attrs: dict[str, str] = dict(attrs or {})
        self.children: list[Node] = []

    # --- tree ops -------------------------------------------------------
    def append(self, node: Node) -> None:
        node.detach()
        node.parent = self
        self.children.append(node)

    def element_children(self) -> list["Element"]:
        return [c for c in self.children if isinstance(c, Element)]

    def descendants(self):
        # iterative DFS (document order); snapshot children so callers may
        # detach during iteration
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            yield node
            if isinstance(node, Element) and node.children:
                stack.extend(reversed(node.children))

    def text_contents(self) -> str:
        return "".join(c.text_contents() for c in self.children)

    def get(self, name: str) -> str | None:
        return self.attrs.get(name)

    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    # --- selectors ------------------------------------------------------
    def select(self, selector: str) -> list["Element"]:
        """Document-order matches for a CSS selector subset: tag, .class,
        #id, [attr], [attr=v], [attr*=v], [attr^=v], [attr$=v], compounds,
        descendant combinator, comma groups."""
        groups = _parsed_groups(selector)
        out: list[Element] = []
        for node in self.descendants():
            if isinstance(node, Element):
                for chain in groups:
                    if _matches_chain(node, chain, scope=self):
                        out.append(node)
                        break
        return out

    def select_first(self, selector: str) -> "Element | None":
        groups = _parsed_groups(selector)
        for node in self.descendants():
            if isinstance(node, Element):
                for chain in groups:
                    if _matches_chain(node, chain, scope=self):
                        return node
        return None

    def matches(self, selector: str) -> bool:
        return any(
            _matches_compound(self, chain[-1]) for chain in _parsed_groups(selector)
        )

    def __repr__(self) -> str:
        return f"<{self.tag} {self.attrs}>"

    # --- serialization --------------------------------------------------
    def serialize(self) -> str:
        """Serialize this element (tag + subtree), html5ever style."""
        out: list[str] = []
        _serialize_node(self, out)
        return "".join(out)

    def serialize_children(self) -> str:
        out: list[str] = []
        for c in self.children:
            _serialize_node(c, out)
        return "".join(out)


def _escape_text(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("\xa0", "&nbsp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )


def _escape_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace("\xa0", "&nbsp;").replace('"', "&quot;")


def _serialize_node(node: Node, out: list[str]) -> None:
    if isinstance(node, Text):
        parent = node.parent
        if parent is not None and parent.tag in RAW_TEXT_ELEMENTS:
            out.append(node.data)
        else:
            out.append(_escape_text(node.data))
    elif isinstance(node, Comment):
        out.append(f"<!--{node.data}-->")
    elif isinstance(node, Element):
        attrs = "".join(
            f' {k}="{_escape_attr(v)}"' for k, v in node.attrs.items()
        )
        out.append(f"<{node.tag}{attrs}>")
        if node.tag not in VOID_ELEMENTS:
            for c in node.children:
                _serialize_node(c, out)
            out.append(f"</{node.tag}>")


# --- selector parsing ----------------------------------------------------

from functools import lru_cache


def _split_selector_list(selector: str) -> list[str]:
    return [s.strip() for s in selector.split(",") if s.strip()]


@lru_cache(maxsize=512)
def _parsed_groups(selector: str) -> tuple:
    return tuple(
        tuple(_parse_compound(tok) for tok in s.split())
        for s in _split_selector_list(selector)
    )


def _parse_compound(token: str) -> dict:
    """Parse one compound selector like tag.cls#id[attr*="v"]."""
    spec = {"tag": None, "classes": [], "id": None, "attrs": []}
    i, n = 0, len(token)
    while i < n:
        ch = token[i]
        if ch == ".":
            j = i + 1
            while j < n and token[j] not in ".#[":
                j += 1
            spec["classes"].append(token[i + 1:j])
            i = j
        elif ch == "#":
            j = i + 1
            while j < n and token[j] not in ".#[":
                j += 1
            spec["id"] = token[i + 1:j]
            i = j
        elif ch == "[":
            j = token.index("]", i)
            body = token[i + 1:j]
            op, name, value = "", body, None
            for candidate in ("*=", "^=", "$=", "~=", "="):
                if candidate in body:
                    name, _, value = body.partition(candidate)
                    op = candidate
                    break
            if value is not None:
                value = value.strip()
                if len(value) >= 2 and value[0] in "\"'" and value[-1] == value[0]:
                    value = value[1:-1]
            spec["attrs"].append((name.strip().lower(), op, value))
            i = j + 1
        else:
            j = i
            while j < n and token[j] not in ".#[":
                j += 1
            spec["tag"] = token[i:j].lower()
            i = j
    return spec


def _parse_compound_chain(selector: str) -> list[dict]:
    """Descendant-combinator chain of compounds."""
    return [_parse_compound(tok) for tok in selector.split()]


def _matches_compound(el: Element, spec: dict) -> bool:
    if spec["tag"] and spec["tag"] not in ("*",) and el.tag != spec["tag"]:
        return False
    if spec["id"] is not None and el.attrs.get("id") != spec["id"]:
        return False
    for cls in spec["classes"]:
        if cls not in el.classes():
            return False
    for name, op, value in spec["attrs"]:
        actual = el.attrs.get(name)
        if actual is None:
            return False
        if op == "" or value is None:
            continue
        if op == "=" and actual != value:
            return False
        if op == "*=" and value not in actual:
            return False
        if op == "^=" and not actual.startswith(value):
            return False
        if op == "$=" and not actual.endswith(value):
            return False
        if op == "~=" and value not in actual.split():
            return False
    return True


def _matches_chain(el: Element, chain: list[dict], scope: Element) -> bool:
    if not _matches_compound(el, chain[-1]):
        return False
    # walk ancestors for the remaining compounds (descendant combinator)
    remaining = list(chain[:-1])
    node = el.parent
    while remaining and node is not None and node is not scope.parent:
        if _matches_compound(node, remaining[-1]):
            remaining.pop()
        node = node.parent
    return not remaining


# --- parsing -------------------------------------------------------------

class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("#fragment")
        self.stack: list[Element] = [self.root]

    @property
    def top(self) -> Element:
        return self.stack[-1]

    def _implied_ends(self, tag: str) -> None:
        closes = _CLOSES.get(tag)
        if closes:
            while len(self.stack) > 1 and self.top.tag in closes:
                self.stack.pop()
        if tag in _BLOCKISH_CLOSES_P:
            # <p> has an implied end before any block-ish start tag
            for idx in range(len(self.stack) - 1, 0, -1):
                if self.stack[idx].tag == "p":
                    del self.stack[idx:]
                    break
                if self.stack[idx].tag not in ("a", "span", "b", "i", "em",
                                               "strong", "u", "small", "font"):
                    break

    def handle_starttag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        self._implied_ends(tag)
        attr_dict: dict[str, str] = {}
        for k, v in attrs:
            if k not in attr_dict:  # first occurrence wins (html5)
                attr_dict[k.lower()] = v if v is not None else ""
        el = Element(tag, attr_dict)
        self.top.append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        self._implied_ends(tag)
        attr_dict: dict[str, str] = {}
        for k, v in attrs:
            if k not in attr_dict:
                attr_dict[k.lower()] = v if v is not None else ""
        self.top.append(Element(tag, attr_dict))

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        for idx in range(len(self.stack) - 1, 0, -1):
            if self.stack[idx].tag == tag:
                del self.stack[idx:]
                return
        # unmatched end tag: ignore

    def handle_data(self, data: str) -> None:
        if data:
            self.top.append(Text(data))

    def handle_comment(self, data: str) -> None:
        self.top.append(Comment(data))


class Document(Element):
    """Root node: an ``html`` element wrapper with head/body structure,
    mirroring what an html5 parser produces for arbitrary input."""

    def __init__(self) -> None:
        super().__init__("#document")

    @property
    def html(self) -> Element:
        return self.element_children()[0]

    @property
    def head(self) -> Element | None:
        for c in self.html.element_children():
            if c.tag == "head":
                return c
        return None

    @property
    def body(self) -> Element | None:
        for c in self.html.element_children():
            if c.tag == "body":
                return c
        return None

    def serialize(self) -> str:  # document serializes its children only
        return self.serialize_children()


def parse_html(html: str) -> Document:
    """Parse an HTML string into a Document with html>head+body structure."""
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        pass  # salvage whatever tree was built (lenient like html5 parsers)
    frag = builder.root

    doc = Document()
    # find an explicit <html>
    html_el = next((c for c in frag.element_children() if c.tag == "html"), None)
    if html_el is not None:
        stray = [c for c in frag.children if c is not html_el]
    else:
        html_el = Element("html")
        stray = list(frag.children)

    head_el = next((c for c in html_el.element_children() if c.tag == "head"), None)
    body_el = next((c for c in html_el.element_children() if c.tag == "body"), None)
    if head_el is None:
        head_el = Element("head")
    if body_el is None:
        body_el = Element("body")

    # distribute loose children (of fragment and of html) into head/body
    loose: list[Node] = []
    for c in list(html_el.children):
        if c is head_el or c is body_el:
            continue
        loose.append(c)
    loose.extend(stray)

    in_head = True
    pending_ws: list[Node] = []
    for node in loose:
        node.detach()
        if in_head:
            if isinstance(node, Element) and node.tag in HEAD_ELEMENTS:
                head_el.append(node)
                continue
            if isinstance(node, Text) and not node.data.strip():
                pending_ws.append(node)
                continue
            if isinstance(node, Comment):
                head_el.append(node)
                continue
            in_head = False
        for ws in pending_ws:
            body_el.append(ws)
        pending_ws = []
        body_el.append(node)
    for ws in pending_ws:
        body_el.append(ws)

    # rebuild html element: head then body (plus nothing else)
    for c in list(html_el.children):
        c.detach()
    html_attrs = dict(html_el.attrs)
    fresh_html = Element("html", html_attrs)
    fresh_html.append(head_el)
    fresh_html.append(body_el)
    doc.append(fresh_html)
    return doc
