"""strip_html — one implementation shared by every execution surface.

Reference semantics (lib/bloblang/x/query/methods_strings.go:596-616,
lib/processor/text.go strip_html operator): ``bluemonday.NewPolicy().
Sanitize``. bluemonday tokenizes with net/html, which DECODES character
entities in text tokens, and renders text via ``html.EscapeString``, which
re-escapes exactly ``& ' < > "`` (as ``&amp; &#39; &lt; &gt; &#34;``).  The
net effect for entities: the escapable five survive round-trip in canonical
form (``&quot;`` -> ``&#34;``), while every other entity (``&nbsp;``,
``&eacute;``, numeric refs, ...) becomes its literal character.  Raw
``'``/``"`` in plain text come OUT escaped.

Python's ``html.unescape`` implements the same HTML5 named-reference table
(including the no-trailing-semicolon legacy forms) as net/html, so
decode-then-re-escape here matches the reference byte-for-byte on text
content.

Known divergence (documented, out of scope): bluemonday passes the raw
text content of ``<script>``/``<style>`` elements through unescaped and
drops comments via the tokenizer; the regex tag-strip here treats their
content as ordinary text.  None of the reference's own test vectors cover
those cases.
"""

from __future__ import annotations

import html as _html
import re as _re

_TAG_RE = _re.compile(r"<[^>]*>")
# characters Go's html.EscapeString escapes, with its exact output forms
_GO_ESCAPE = {
    "&": "&amp;",
    "'": "&#39;",
    "<": "&lt;",
    ">": "&gt;",
    '"': "&#34;",
}
_ESC_RE = _re.compile(r"[&'<>\"]")
# after tag-stripping, only strings containing one of these need the
# decode/re-escape pass at all (entities start with &; bare quotes escape)
_NEEDS_SLOW = _re.compile(r"[&'\"]")


def _escape_go(s: str) -> str:
    return _ESC_RE.sub(lambda m: _GO_ESCAPE[m.group()], s)


def strip_html_str(s: str) -> str:
    """Strip tags, decode entities, re-escape the Go escapable set."""
    s = _TAG_RE.sub("", s)
    if _NEEDS_SLOW.search(s) is None:
        return s
    return _escape_go(_html.unescape(s))


def strip_html_series(s):
    """Vectorized pandas path: regex tag-strip on the whole Series, slow
    decode/re-escape only on rows that contain ``&``/``'``/``"``."""
    out = s.str.replace(_TAG_RE, "", regex=True)
    mask = out.str.contains(_NEEDS_SLOW, na=False)
    if mask.any():
        out = out.mask(
            mask, out[mask].map(lambda x: _escape_go(_html.unescape(x)))
        )
    return out
