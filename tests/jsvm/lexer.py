"""Tokenizer for the bounded ES subset (see package docstring).

No regex literals, no numeric separators, no bigint -- the frontend uses
none of them, and unsupported input must fail loudly.
"""

from __future__ import annotations

from dataclasses import dataclass


class JSSyntaxError(SyntaxError):
    pass


KEYWORDS = {
    "const", "let", "function", "return", "if", "else", "for", "while",
    "break", "continue", "new", "class", "extends", "super", "this",
    "true", "false", "null", "undefined", "typeof", "try", "catch",
    "finally", "throw", "of", "in", "async", "await", "static",
}

# Longest-first so '===' wins over '=='.
PUNCTUATORS = [
    ">>>=", "...", "===", "!==", ">>>", "**=", "<<=", ">>=", "&&=",
    "||=", "??=", "&=", "|=", "^=",
    "=>", "==", "!=", "<=", ">=", "&&", "||", "??", "++", "--",
    "+=", "-=", "*=", "/=", "%=", "**", "<<", ">>",
    "{", "}", "(", ")", "[", "]", ";", ",", "<", ">", "+", "-", "*",
    "/", "%", "=", "!", "?", ":", ".", "&", "|", "^", "~",
]


@dataclass
class Token:
    kind: str     # 'num' | 'str' | 'template' | 'name' | 'keyword' | 'punct' | 'eof'
    value: object
    line: int
    # 'template' tokens carry value = list of parts:
    #   ('str', text) | ('expr', [Token...]) pieces, in order.


def _is_name_start(c: str) -> bool:
    return c.isalpha() or c in "_$"


def _is_name_char(c: str) -> bool:
    return c.isalnum() or c in "_$"


def tokenize(src: str, filename: str = "<js>") -> list[Token]:
    toks: list[Token] = []
    i, n, line = 0, len(src), 1

    def err(msg: str) -> JSSyntaxError:
        return JSSyntaxError(f"{filename}:{line}: {msg}")

    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            i += 1
            continue
        if c in " \t\r":
            i += 1
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i + 2)
            if j < 0:
                raise err("unterminated block comment")
            line += src.count("\n", i, j)
            i = j + 2
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            if src.startswith(("0x", "0X"), i):
                j = i + 2
                while j < n and (src[j] in "abcdefABCDEF" or src[j].isdigit()):
                    j += 1
                toks.append(Token("num", float(int(src[i:j], 16)), line))
                i = j
                continue
            j = i
            seen_dot = seen_exp = False
            while j < n:
                d = src[j]
                if d.isdigit():
                    j += 1
                elif d == "." and not seen_dot and not seen_exp:
                    seen_dot = True
                    j += 1
                elif d in "eE" and not seen_exp and j > i:
                    seen_exp = True
                    j += 1
                    if j < n and src[j] in "+-":
                        j += 1
                else:
                    break
            toks.append(Token("num", float(src[i:j]), line))
            i = j
            continue
        if c in "'\"":
            i += 1
            buf = []
            while i < n and src[i] != c:
                ch = src[i]
                if ch == "\\":
                    i += 1
                    if i >= n:
                        raise err("unterminated string escape")
                    buf.append(_unescape(src[i], err))
                elif ch == "\n":
                    raise err("newline in string literal")
                else:
                    buf.append(ch)
                i += 1
            if i >= n:
                raise err("unterminated string literal")
            i += 1
            toks.append(Token("str", "".join(buf), line))
            continue
        if c == "`":
            i, line, parts = _scan_template(src, i + 1, line, filename)
            toks.append(Token("template", parts, line))
            continue
        if _is_name_start(c):
            j = i + 1
            while j < n and _is_name_char(src[j]):
                j += 1
            word = src[i:j]
            toks.append(Token("keyword" if word in KEYWORDS else "name", word, line))
            i = j
            continue
        for p in PUNCTUATORS:
            if src.startswith(p, i):
                toks.append(Token("punct", p, line))
                i += len(p)
                break
        else:
            raise err(f"unexpected character {c!r}")
    toks.append(Token("eof", None, line))
    return toks


def _unescape(ch: str, err) -> str:
    table = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", "'": "'",
             '"': '"', "`": "`", "0": "\0", "$": "$", "\n": ""}
    if ch in table:
        return table[ch]
    # \uXXXX etc. are unused in the frontend; anything exotic fails loudly
    if ch in "ux":
        raise err("unicode/hex escapes unsupported in jsvm")
    return ch


def _scan_template(src: str, i: int, line: int, filename: str):
    """Scan a template literal body starting after the opening backtick.

    Returns (index after closing backtick, line, parts) where parts is a
    list of ('str', text) and ('expr', token-list) pieces.
    """
    n = len(src)
    parts: list[tuple] = []
    buf: list[str] = []

    def flush():
        if buf:
            parts.append(("str", "".join(buf)))
            buf.clear()

    while i < n:
        ch = src[i]
        if ch == "`":
            flush()
            return i + 1, line, parts
        if ch == "\\":
            i += 1
            if i >= n:
                break
            buf.append(_unescape(src[i], lambda m: JSSyntaxError(f"{filename}:{line}: {m}")))
            i += 1
            continue
        if ch == "\n":
            line += 1
            buf.append(ch)
            i += 1
            continue
        if src.startswith("${", i):
            flush()
            depth = 1
            j = i + 2
            start = j
            while j < n and depth:
                d = src[j]
                if d == "{":
                    depth += 1
                elif d == "}":
                    depth -= 1
                elif d == "`":
                    # nested template: skip it wholesale (balanced backticks)
                    k, line, _ = _scan_template(src, j + 1, line, filename)
                    j = k - 1
                elif d in "'\"":
                    q = d
                    j += 1
                    while j < n and src[j] != q:
                        j += 2 if src[j] == "\\" else 1
                elif d == "\n":
                    line += 1
                j += 1
            if depth:
                raise JSSyntaxError(f"{filename}:{line}: unterminated ${{...}}")
            inner = src[start:j - 1]
            parts.append(("expr", tokenize(inner, filename)))
            i = j
            continue
        buf.append(ch)
        i += 1
    raise JSSyntaxError(f"{filename}:{line}: unterminated template literal")
