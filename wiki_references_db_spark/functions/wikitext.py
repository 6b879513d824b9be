"""Hand-rolled wikitext parsing + normalization.

Reimplements the observable behavior of the reference's extractor
submodule (absent from the snapshot; behavior defined by the golden
vectors in reference:tests/test_syntax.py:6-67 and the README contract
reference:README.md:5-7).  mwparserfromhell is not available in this
environment, so the parser is a small recursive-descent scanner purpose-
built for the constructs citations use: templates, <ref> tags, wikilinks,
external links, <nowiki>, HTML comments.

Normalization rules (derived from the golden vectors):
- whole text trimmed; newlines in top-level text preserved
- templates: name first-char-uppercased, underscores->spaces; positional
  params keep order; named params (incl. numeric keys) sorted by their
  rendered "key=value" string (codepoint order — this is why
  ``url-status=dead`` sorts before ``url=http://...``); spaces around
  '|' and '=' stripped; param values whitespace-folded to single spaces;
  nested templates normalized recursively
- wikilink targets: underscores->spaces, first-char-uppercased
- <ref> names quoted; self-closing refs end in " />"; ref content
  trimmed but internal newlines kept
- list-marker runs (* # : ;) get exactly one space before content
- <nowiki> content untouched
"""

from __future__ import annotations

import hashlib
import re

__all__ = ["normalize_wikitext", "get_sha1", "scan_segments", "parse_template"]


def get_sha1(text: str) -> str:
    """SHA-1 hex digest of a reference string (content addressing,
    reference:build_db.py:343-344)."""
    return hashlib.sha1(text.encode("utf-8")).hexdigest()


# --------------------------------------------------------------------------
# Segment scanner
# --------------------------------------------------------------------------

_REF_OPEN = re.compile(r"<ref(?=[\s/>])", re.IGNORECASE)
_REF_CLOSE = re.compile(r"</ref\s*>", re.IGNORECASE)
_NOWIKI_OPEN = re.compile(r"<nowiki>", re.IGNORECASE)
_NOWIKI_CLOSE = re.compile(r"</nowiki>", re.IGNORECASE)
_URL_SCHEME = re.compile(r"https?://|ftp://", re.IGNORECASE)
_SPECIAL_CHAR = re.compile(r"[<{\[]")


# The matchers below jump between delimiter occurrences with compiled
# regex searches instead of advancing one character at a time — same
# semantics, an order of magnitude fewer Python-level iterations on
# prose-dominated wikitext (this layer is the extraction pipeline's
# hot path; see tools/bench_pipeline.py).
_BRACE_PAIR = re.compile(r"\{\{|\}\}")
_BRACKET_PAIR = re.compile(r"\[\[|\]\]")
_EXTLINK_STOP = re.compile(r"\[\[|\]|\n")


def _find_matching_braces(text: str, start: int) -> int:
    """``start`` points at '{{'; return index just past the matching '}}'
    or -1."""
    depth = 0
    pos = start
    while True:
        m = _BRACE_PAIR.search(text, pos)
        if m is None:
            return -1
        if m.group() == "{{":
            depth += 1
        else:
            depth -= 1
            if depth == 0:
                return m.end()
        pos = m.end()


def _find_matching_brackets(text: str, start: int, open_s: str, close_s: str) -> int:
    if (open_s, close_s) == ("[[", "]]"):
        pair = _BRACKET_PAIR
    else:  # pragma: no cover - only [[/]] is used today
        pair = re.compile(re.escape(open_s) + "|" + re.escape(close_s))
    depth = 0
    pos = start
    while True:
        m = pair.search(text, pos)
        if m is None:
            return -1
        if m.group() == open_s:
            depth += 1
        else:
            depth -= 1
            if depth == 0:
                return m.end()
        pos = m.end()


def _find_single_bracket_end(text: str, start: int) -> int:
    """External link: '[' ... ']' where the body may contain [[wikilinks]]."""
    pos = start + 1
    while True:
        m = _EXTLINK_STOP.search(text, pos)
        if m is None:
            return -1
        tok = m.group()
        if tok == "[[":
            end = _find_matching_brackets(text, m.start(), "[[", "]]")
            if end == -1:
                return -1
            pos = end
        elif tok == "]":
            return m.end()
        else:
            return -1  # external links don't span lines


def scan_segments(text: str) -> list[tuple[str, int, int]]:
    """Return (kind, start, end) tuples covering ``text``.

    kinds: 'comment', 'nowiki', 'ref' (paired tag), 'selfref'
    (self-closing), 'template', 'wikilink', 'extlink', 'text'.
    Malformed constructs fall through as plain text.
    """
    i = 0
    n = len(text)
    text_start = i
    out: list[tuple[str, int, int]] = []

    def emit_text(upto: int) -> None:
        if upto > text_start:
            out.append(("text", text_start, upto))

    while i < n:
        # Jump straight to the next character that can open a construct;
        # everything in between is plain text by definition.
        m = _SPECIAL_CHAR.search(text, i)
        if m is None:
            break
        i = m.start()
        ch = text[i]
        if ch == "<":
            if text.startswith("<!--", i):
                end = text.find("-->", i + 4)
                end = (end + 3) if end != -1 else n
                emit_text(i)
                out.append(("comment", i, end))
                i = end
                text_start = i
                continue
            m = _NOWIKI_OPEN.match(text, i)
            if m:
                mc = _NOWIKI_CLOSE.search(text, m.end())
                end = mc.end() if mc else n
                emit_text(i)
                out.append(("nowiki", i, end))
                i = end
                text_start = i
                continue
            m = _REF_OPEN.match(text, i)
            if m:
                gt = text.find(">", m.end())
                if gt == -1:
                    i += 1
                    continue
                emit_text(i)
                if text[gt - 1] == "/":
                    out.append(("selfref", i, gt + 1))
                    i = gt + 1
                else:
                    mc = _REF_CLOSE.search(text, gt + 1)
                    if mc:
                        out.append(("ref", i, mc.end()))
                        i = mc.end()
                    else:
                        out.append(("selfref", i, gt + 1))  # unterminated tag
                        i = gt + 1
                text_start = i
                continue
            i += 1
            continue
        if text.startswith("{{", i):
            end = _find_matching_braces(text, i)
            if end != -1:
                emit_text(i)
                out.append(("template", i, end))
                i = end
                text_start = i
                continue
            i += 2
            continue
        if text.startswith("[[", i):
            end = _find_matching_brackets(text, i, "[[", "]]")
            if end != -1:
                emit_text(i)
                out.append(("wikilink", i, end))
                i = end
                text_start = i
                continue
            i += 2
            continue
        if ch == "[" and _URL_SCHEME.match(text, i + 1):
            end = _find_single_bracket_end(text, i)
            if end != -1:
                emit_text(i)
                out.append(("extlink", i, end))
                i = end
                text_start = i
                continue
            i += 1
            continue
        i += 1
    emit_text(n)
    return out


# --------------------------------------------------------------------------
# Template parsing
# --------------------------------------------------------------------------


# Depth-tracking split/find jump between delimiter occurrences with a
# per-separator compiled regex (leftmost-match order is identical to the
# char-by-char scan it replaces).  Separators in use are '|' and '=' —
# never a bracket character, so the alternation is unambiguous.
_TOP_LEVEL_RES: dict[str, re.Pattern] = {}


def _top_level_re(sep: str) -> re.Pattern:
    pat = _TOP_LEVEL_RES.get(sep)
    if pat is None:
        pat = re.compile(r"\{\{|\}\}|[\[\]" + re.escape(sep) + "]")
        _TOP_LEVEL_RES[sep] = pat
    return pat


def _split_top_level(s: str, sep: str) -> list[str]:
    """Split on ``sep`` at curly/square bracket depth 0."""
    pat = _top_level_re(sep)
    parts = []
    depth_curly = 0
    depth_sq = 0
    last = 0
    pos = 0
    while True:
        m = pat.search(s, pos)
        if m is None:
            break
        tok = m.group()
        pos = m.end()
        if tok == "{{":
            depth_curly += 1
        elif tok == "}}":
            depth_curly -= 1
        elif tok == "[":
            depth_sq += 1
        elif tok == "]":
            depth_sq -= 1
        elif depth_curly == 0 and depth_sq == 0:
            parts.append(s[last : m.start()])
            last = pos
    parts.append(s[last:])
    return parts


def _find_top_level(s: str, ch: str) -> int:
    pat = _top_level_re(ch)
    depth_curly = 0
    depth_sq = 0
    pos = 0
    while True:
        m = pat.search(s, pos)
        if m is None:
            return -1
        tok = m.group()
        pos = m.end()
        if tok == "{{":
            depth_curly += 1
        elif tok == "}}":
            depth_curly -= 1
        elif tok == "[":
            depth_sq += 1
        elif tok == "]":
            depth_sq -= 1
        elif depth_curly == 0 and depth_sq == 0:
            return m.start()


def normalize_template_name(raw: str) -> str:
    """underscores->spaces, whitespace collapsed, first char uppercased
    (rest preserved) — reference:models.py:457-463 semantics."""
    name = re.sub(r"\s+", " ", raw.replace("_", " ")).strip()
    if not name:
        return name
    return name[0].upper() + name[1:]


def parse_template(src: str):
    """Parse '{{...}}' source -> (raw_name, [(key_or_None, raw_value)]).

    Split happens at top nesting level only; nested structures stay
    inside values.
    """
    inner = src[2:-2]
    parts = _split_top_level(inner, "|")
    raw_name = parts[0]
    params: list[tuple[str | None, str]] = []
    for part in parts[1:]:
        eq = _find_top_level(part, "=")
        if eq != -1:
            params.append((part[:eq], part[eq + 1 :]))
        else:
            params.append((None, part))
    return raw_name, params


# --------------------------------------------------------------------------
# Normalization (rendering)
# --------------------------------------------------------------------------

_WS_RUN = re.compile(r"\s+")
_HSPACE_RUN = re.compile(r"[ \t]+")
_LIST_LINE = re.compile(r"^([*#:;]+)[ \t]*(.*)$")
_REF_ATTR = re.compile(
    r"""([A-Za-z_][\w:-]*)\s*=\s*("([^"]*)"|'([^']*)'|([^\s/>]+))"""
)
_PLACEHOLDER = "\x00{}\x00"
_PLACEHOLDER_RE = re.compile("\x00(\\d+)\x00")


def _collapse(s: str) -> str:
    return _WS_RUN.sub(" ", s).strip()


def _render_template(src: str, protected: list[str]) -> str:
    raw_name, params = parse_template(src)
    name = normalize_template_name(raw_name)
    positional: list[str] = []
    named: list[str] = []
    for key, raw_value in params:
        value = _collapse(_render(raw_value, protected))
        if key is None:
            positional.append(value)
        else:
            named.append(f"{_collapse(key)}={value}")
    named.sort()
    return "{{" + "|".join([name] + positional + named) + "}}"


def _render_wikilink(src: str, protected: list[str]) -> str:
    inner = src[2:-2]
    parts = _split_top_level(inner, "|")
    target = _collapse(parts[0].replace("_", " "))
    if target:
        target = target[0].upper() + target[1:]
    rest = [_collapse(_render(p, protected)) for p in parts[1:]]
    return "[[" + "|".join([target] + rest) + "]]"


def _render_extlink(src: str, protected: list[str]) -> str:
    inner = src[1:-1]
    m = re.match(r"(\S+)([ \t]+(.*))?$", inner, re.DOTALL)
    if not m:
        return "[" + _collapse(inner) + "]"
    url = m.group(1)
    label = m.group(3)
    if label is None:
        return "[" + url + "]"
    return "[" + url + " " + _collapse(_render(label, protected)) + "]"


def _render_ref_open_tag(tag_src: str, self_closing: bool) -> str:
    attrs = _REF_ATTR.findall(tag_src)
    parts = ["<ref"]
    for name, _, dq, sq, bare in attrs:
        val = dq or sq or bare
        parts.append(f' {name}="{val}"')
    return "".join(parts) + (" />" if self_closing else ">")


def _render_ref(src: str, protected: list[str]) -> str:
    gt = src.find(">")
    tag_src = src[: gt + 1]
    close = _REF_CLOSE.search(src)
    content = src[gt + 1 : close.start()] if close else src[gt + 1 :]
    rendered = _render(content, protected).strip()
    return _render_ref_open_tag(tag_src, self_closing=False) + rendered + "</ref>"


def _render(text: str, protected: list[str]) -> str:
    """Render segments; nowiki/comment spans become placeholders so the
    later whitespace passes cannot touch them."""
    parts = []
    for kind, start, end in scan_segments(text):
        src = text[start:end]
        if kind == "template":
            parts.append(_render_template(src, protected))
        elif kind == "wikilink":
            parts.append(_render_wikilink(src, protected))
        elif kind == "extlink":
            parts.append(_render_extlink(src, protected))
        elif kind == "ref":
            parts.append(_render_ref(src, protected))
        elif kind == "selfref":
            gt = src.find(">")
            parts.append(_render_ref_open_tag(src[: gt + 1], self_closing=True))
        elif kind in ("nowiki", "comment"):
            parts.append(_PLACEHOLDER.format(len(protected)))
            protected.append(src)
        else:  # text — structural fixes happen later, line-wise
            parts.append(src)
    return "".join(parts)


def _fix_lines(s: str) -> str:
    """Line-level normalization of the fully rendered string: list-marker
    spacing, horizontal whitespace collapse, trailing-space strip."""
    out = []
    for line in s.split("\n"):
        # Match list markers AFTER stripping leading horizontal whitespace:
        # the else-branch strips it anyway, so a marker hiding behind
        # indentation (' :0') must normalize the same way in one pass as it
        # would in two — otherwise normalize() is not idempotent and the
        # same citation can hash two ways (sha1 identity is content-addressed).
        m = _LIST_LINE.match(line.lstrip(" \t"))
        if m:
            markers, rest = m.groups()
            rest = _HSPACE_RUN.sub(" ", rest).rstrip()
            line = markers + (" " + rest if rest else "")
        else:
            line = _HSPACE_RUN.sub(" ", line).strip()
        out.append(line)
    return "\n".join(out)


def normalize_wikitext(text: str) -> str | None:
    """Normalize a reference string so equivalent formattings hash
    identically (golden vectors: reference:tests/test_syntax.py:6-67)."""
    if text is None:
        return None
    protected: list[str] = []
    rendered = _render(text, protected)
    fixed = _fix_lines(rendered)
    lines = fixed.split("\n")
    while lines and not lines[0].strip():
        lines.pop(0)
    while lines and not lines[-1].strip():
        lines.pop()
    result = "\n".join(lines).strip()
    if protected:
        result = _PLACEHOLDER_RE.sub(lambda m: protected[int(m.group(1))], result)
    return result
