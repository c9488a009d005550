"""Deterministic HTML title/text/link extraction.

The reference parses HTML with the `scraper` crate and extracts links with
`linkify` inside user `Spider::parse` impls (inferred from
Cargo.lock:1755,1761; invoked at src/crawler/response_parser.rs:110). Here
the extractor is ONE pure function shared by three call sites so the
"byte-identical extracted text per url" invariant (BASELINE.json
input_hint) holds by construction:

1. the synthetic site generator (writes the `text` column of pages),
2. the vectorized parse UDF (operators/parse.py, Arrow-batched), and
3. the pytest / simulator oracle.
"""

from __future__ import annotations

from html.parser import HTMLParser

_BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li ul ol table tr td th br hr article section "
    "header footer blockquote pre title body".split()
)
_SKIP_TAGS = frozenset(("script", "style", "noscript"))


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.links: list[str] = []
        self.title_parts: list[str] = []
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        if tag == "title":
            self._in_title = True
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)
                    break
        if tag in _BLOCK_TAGS:
            self.chunks.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag == "title":
            self._in_title = False
        if tag in _BLOCK_TAGS:
            self.chunks.append("\n")

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title:
            self.title_parts.append(data)
        self.chunks.append(data)


def extract(html: bytes | str) -> tuple[str, str, list[str]]:
    """(title, text, links) from HTML bytes.

    text: data nodes outside script/style, block tags become newlines,
    runs of whitespace-only lines collapsed, stripped. Deterministic —
    same bytes in, same bytes out, no locale/env dependence.
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _Extractor()
    p.feed(html)
    p.close()
    title = " ".join(" ".join(p.title_parts).split())
    lines = [" ".join(seg.split()) for seg in "".join(p.chunks).split("\n")]
    text = "\n".join(ln for ln in lines if ln)
    return title, text, p.links


def resolve_link(base_url: str, href: str) -> str | None:
    """Minimal deterministic link resolution (absolute + site-relative).

    The synthetic graph only emits absolute and root-relative hrefs, so a
    tiny resolver keeps engine and oracle trivially identical; a full RFC
    3986 resolver is not required for parity.
    """
    if href.startswith(("http://", "https://")):
        return href
    if href.startswith("/"):
        m = base_url.split("://", 1)
        if len(m) != 2:
            return None
        scheme, rest = m
        host = rest.split("/", 1)[0]
        return f"{scheme}://{host}{href}"
    return None
