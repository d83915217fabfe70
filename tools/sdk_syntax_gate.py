"""Offline syntax/sanity gate for the TypeScript and Go SDKs.

The reference CI compiles and tests both SDKs with their native
toolchains (/root/reference/.github/workflows/ci.yml:37-59); this
image has neither node nor go, so sdks/{typescript,go} would otherwise
ship with ZERO in-image parse coverage — a truncated file, unbalanced
brace, or renamed method would only surface on a network-enabled
runner. This gate is the strongest check expressible without the
toolchains, in three layers per file:

  1. lexical integrity — strings (incl. TS template literals with
     nested ${}, TS regex literals, Go raw strings and runes), line
     and block comments all terminate before EOF;
  2. structural integrity — (), {}, [] balance and nest correctly in
     code (i.e. outside strings/comments);
  3. package sanity — relative TS imports resolve to real files, Go
     files declare a package, and the wire-parity client API census
     (the method names the reference SDKs expose) is present.

It is NOT a type checker: `tsc --noEmit` / `go vet` still run in CI
(.github/workflows/ci.yml sdk-node/sdk-go) on runners that have the
toolchains. Run as a script (exit 1 on findings) or via
tests/test_sdk_offline_gate.py.
"""

from __future__ import annotations

import os
import re
import sys
from typing import List, Tuple

OPEN = {"(": ")", "[": "]", "{": "}"}
CLOSE = {v: k for k, v in OPEN.items()}

#: tokens after which a `/` in TS starts a regex literal, not division
_TS_REGEX_PREFIX = re.compile(
    r"(?:^|[=(,\[{;:!&|?+\-*%<>~^]|\breturn|\btypeof|\bcase|\bin|"
    r"\bof|\bnew|\bdo|\belse|=>)\s*$")


class Finding(Exception):
    pass


def _err(path: str, line: int, msg: str) -> str:
    return f"{path}:{line}: {msg}"


def strip_ts(src: str, path: str, errors: List[str]) -> str:
    """Return src with comments/strings/regex blanked (newlines kept),
    appending lexical-integrity findings to errors."""
    out = []
    i, n = len(""), len(src)
    i = 0
    line = 1

    def blank_until(j: int) -> None:
        nonlocal line
        for ch in src[i:j]:
            out.append("\n" if ch == "\n" else " ")
            if ch == "\n":
                line += 1

    while i < n:
        ch = src[i]
        two = src[i:i + 2]
        if two == "//":
            j = src.find("\n", i)
            j = n if j < 0 else j
            blank_until(j)
            i = j
        elif two == "/*":
            j = src.find("*/", i + 2)
            if j < 0:
                errors.append(_err(path, line, "unterminated /* comment"))
                blank_until(n)
                i = n
            else:
                blank_until(j + 2)
                i = j + 2
        elif ch in "'\"":
            j = i + 1
            while j < n and src[j] != ch:
                if src[j] == "\\":
                    j += 1
                elif src[j] == "\n":
                    break
                j += 1
            if j >= n or src[j] != ch:
                errors.append(_err(path, line, "unterminated string"))
                blank_until(min(j, n))
                i = min(j, n)
            else:
                blank_until(j + 1)
                i = j + 1
        elif ch == "`":
            # template literal: nested ${ ... } re-enters code; handle
            # one level of nesting (the SDK sources use no deeper)
            j = i + 1
            depth = 0
            while j < n:
                if src[j] == "\\":
                    j += 2
                    continue
                if depth == 0 and src[j] == "`":
                    break
                if src[j:j + 2] == "${":
                    depth += 1
                    j += 2
                    continue
                if depth > 0 and src[j] == "}":
                    depth -= 1
                j += 1
            if j >= n:
                errors.append(_err(path, line,
                                   "unterminated template literal"))
                blank_until(n)
                i = n
            else:
                blank_until(j + 1)
                i = j + 1
        elif ch == "/":
            # regex literal iff the previous code token allows it
            prev = "".join(out).rstrip()
            if _TS_REGEX_PREFIX.search(prev[-16:] if prev else ""):
                j = i + 1
                in_class = False
                while j < n and (in_class or src[j] != "/"):
                    if src[j] == "\\":
                        j += 1
                    elif src[j] == "[":
                        in_class = True
                    elif src[j] == "]":
                        in_class = False
                    elif src[j] == "\n":
                        break
                    j += 1
                if j >= n or src[j] != "/":
                    errors.append(_err(path, line,
                                       "unterminated regex literal"))
                    i = min(j, n)
                    blank_until(i)
                else:
                    blank_until(j + 1)
                    i = j + 1
            else:
                out.append(ch)
                i += 1
        else:
            out.append(ch)
            if ch == "\n":
                line += 1
            i += 1
    return "".join(out)


def strip_go(src: str, path: str, errors: List[str]) -> str:
    out = []
    i, n, line = 0, len(src), 1

    def blank_until(j: int) -> None:
        nonlocal line
        for ch in src[i:j]:
            out.append("\n" if ch == "\n" else " ")
            if ch == "\n":
                line += 1

    while i < n:
        ch = src[i]
        two = src[i:i + 2]
        if two == "//":
            j = src.find("\n", i)
            j = n if j < 0 else j
            blank_until(j)
            i = j
        elif two == "/*":
            j = src.find("*/", i + 2)
            if j < 0:
                errors.append(_err(path, line, "unterminated /* comment"))
                blank_until(n)
                i = n
            else:
                blank_until(j + 2)
                i = j + 2
        elif ch == "`":  # raw string: no escapes, runs to next backquote
            j = src.find("`", i + 1)
            if j < 0:
                errors.append(_err(path, line, "unterminated raw string"))
                blank_until(n)
                i = n
            else:
                blank_until(j + 1)
                i = j + 1
        elif ch in "'\"":
            j = i + 1
            while j < n and src[j] != ch:
                if src[j] == "\\":
                    j += 1
                elif src[j] == "\n":
                    break
                j += 1
            if j >= n or src[j] != ch:
                errors.append(_err(path, line,
                                   "unterminated string/rune literal"))
                blank_until(min(j, n))
                i = min(j, n)
            else:
                blank_until(j + 1)
                i = j + 1
        else:
            out.append(ch)
            if ch == "\n":
                line += 1
            i += 1
    return "".join(out)


def check_balanced(code: str, path: str) -> List[str]:
    """Bracket balance/nesting over comment/string-stripped code."""
    errors: List[str] = []
    stack: List[Tuple[str, int]] = []
    line = 1
    for ch in code:
        if ch == "\n":
            line += 1
        elif ch in OPEN:
            stack.append((ch, line))
        elif ch in CLOSE:
            if not stack:
                errors.append(_err(path, line, f"unmatched '{ch}'"))
                return errors
            opener, oline = stack.pop()
            if OPEN[opener] != ch:
                errors.append(_err(
                    path, line,
                    f"mismatched '{ch}' (opened '{opener}' at "
                    f"line {oline})"))
                return errors
    for opener, oline in stack[:1]:
        errors.append(_err(path, oline, f"unclosed '{opener}'"))
    return errors


#: wire-parity client API census — the method surface the reference
#: SDKs expose (sdks/typescript/src/client.ts, sdks/go/client.go in
#: the reference repo); a rename or deletion here is an SDK break
TS_CLIENT_METHODS = ("store", "getNode", "deleteNode", "relate",
                     "search", "searchHybrid", "briefing", "traverse",
                     "stats")
GO_CLIENT_METHODS = ("CreateNode", "GetNode", "DeleteNode", "Relate",
                     "Search", "SearchHybrid", "Briefing",
                     "BriefingCompact", "Traverse", "Stats")


def check_ts_package(root: str) -> List[str]:
    errors: List[str] = []
    src_dir = os.path.join(root, "src")
    ts_files = []
    for dirpath, _, names in os.walk(src_dir):
        ts_files += [os.path.join(dirpath, f) for f in names
                     if f.endswith(".ts")]
    if not ts_files:
        return [f"{src_dir}: no TypeScript sources found"]
    for path in sorted(ts_files):
        with open(path, encoding="utf-8") as fh:
            src = fh.read()
        code = strip_ts(src, path, errors)
        errors += check_balanced(code, path)
        # relative imports must resolve within the package (a bare
        # directory does NOT resolve — node needs an index.ts)
        for m in re.finditer(
                r"""(?:from|import)\s+['"](\.\.?/[^'"]+)['"]""", src):
            rel = m.group(1)
            base = os.path.normpath(
                os.path.join(os.path.dirname(path), rel))
            if not any(os.path.exists(base + ext)
                       for ext in (".ts", ".tsx", "/index.ts")):
                line = src[:m.start()].count("\n") + 1
                errors.append(_err(path, line,
                                   f"unresolved import '{rel}'"))
    client = os.path.join(src_dir, "client.ts")
    if not os.path.exists(client):
        # a deleted/renamed client is exactly the breakage class the
        # gate exists for — finding, not traceback
        return errors + [f"{client}:1: client API census: client.ts "
                         f"missing"]
    with open(client, encoding="utf-8") as fh:
        csrc = fh.read()
    for meth in TS_CLIENT_METHODS:
        if not re.search(rf"^\s*(?:async\s+)?{meth}\s*\(", csrc,
                         re.MULTILINE):
            errors.append(f"{client}:1: client API census: method "
                          f"'{meth}' missing")
    return errors


def check_go_package(root: str) -> List[str]:
    errors: List[str] = []
    go_files = [os.path.join(root, f) for f in os.listdir(root)
                if f.endswith(".go")]
    if not go_files:
        return [f"{root}: no Go sources found"]
    for path in sorted(go_files):
        with open(path, encoding="utf-8") as fh:
            src = fh.read()
        code = strip_go(src, path, errors)
        errors += check_balanced(code, path)
        if not re.search(r"^package\s+\w+", code, re.MULTILINE):
            errors.append(_err(path, 1, "missing package declaration"))
    client = os.path.join(root, "client.go")
    if not os.path.exists(client):
        return errors + [f"{client}:1: client API census: client.go "
                         f"missing"]
    with open(client, encoding="utf-8") as fh:
        csrc = fh.read()
    for meth in GO_CLIENT_METHODS:
        if not re.search(
                rf"^func\s+\(c \*Client\)\s+{meth}\(", csrc,
                re.MULTILINE):
            errors.append(f"{client}:1: client API census: method "
                          f"'{meth}' missing")
    return errors


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    errors = check_ts_package(os.path.join(repo, "sdks", "typescript"))
    errors += check_go_package(os.path.join(repo, "sdks", "go"))
    for e in errors:
        print(e, file=sys.stderr)
    print(f"sdk syntax gate: {'FAIL' if errors else 'OK'} "
          f"({len(errors)} finding(s))")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
