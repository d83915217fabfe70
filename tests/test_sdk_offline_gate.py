"""Offline TS/Go SDK syntax gate (VERDICT r3 #7).

The reference CI compiles both SDKs (`tsc`, `go build`); this image
has neither toolchain, so tools/sdk_syntax_gate.py supplies the
strongest in-image substitute: lexical integrity, bracket balance,
import resolution, and the wire-parity client-method census. These
tests (a) gate the shipped SDK sources on every run, and (b) prove
the gate actually catches the breakage classes it claims to, by
mutating copies of the real sources and asserting findings appear —
a checker that cannot fail is not a check.
"""

import os
import shutil

import pytest

from tools.sdk_syntax_gate import (check_balanced, check_go_package,
                                   check_ts_package, strip_go, strip_ts)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TS = os.path.join(REPO, "sdks", "typescript")
GO = os.path.join(REPO, "sdks", "go")


class TestShippedSources:
    def test_typescript_sdk_clean(self):
        assert check_ts_package(TS) == []

    def test_go_sdk_clean(self):
        assert check_go_package(GO) == []


def _corrupt(path: str, old: str, new: str) -> None:
    with open(path, encoding="utf-8") as fh:
        src = fh.read()
    assert old in src, f"mutation anchor {old!r} missing from {path}"
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(src.replace(old, new, 1))


@pytest.fixture
def ts_copy(tmp_path):
    dst = str(tmp_path / "typescript")
    shutil.copytree(TS, dst)
    return dst


@pytest.fixture
def go_copy(tmp_path):
    dst = str(tmp_path / "go")
    shutil.copytree(GO, dst)
    return dst


class TestCatchesBreakage:
    def test_ts_unbalanced_brace(self, ts_copy):
        p = os.path.join(ts_copy, "src", "client.ts")
        _corrupt(p, "async store(", "} async store(")
        errs = check_ts_package(ts_copy)
        assert any("unmatched" in e or "unclosed" in e
                   or "mismatched" in e for e in errs), errs

    def test_ts_truncated_file(self, ts_copy):
        p = os.path.join(ts_copy, "src", "client.ts")
        with open(p, encoding="utf-8") as fh:
            src = fh.read()
        with open(p, "w", encoding="utf-8") as fh:
            fh.write(src[: len(src) // 2])
        assert check_ts_package(ts_copy), "truncation must be caught"

    def test_ts_unterminated_string(self, ts_copy):
        p = os.path.join(ts_copy, "src", "testing.ts")
        with open(p, "a", encoding="utf-8") as fh:
            fh.write('\nconst broken = "no close\n')
        errs = check_ts_package(ts_copy)
        assert any("unterminated string" in e for e in errs), errs

    def test_ts_renamed_method(self, ts_copy):
        p = os.path.join(ts_copy, "src", "client.ts")
        _corrupt(p, "async searchHybrid(", "async searchHybridv2(")
        errs = check_ts_package(ts_copy)
        assert any("searchHybrid" in e and "census" in e
                   for e in errs), errs

    def test_ts_broken_import(self, ts_copy):
        p = os.path.join(ts_copy, "src", "index.ts")
        _corrupt(p, "./client", "./client_gone")
        errs = check_ts_package(ts_copy)
        assert any("unresolved import" in e for e in errs), errs

    def test_go_unbalanced_paren(self, go_copy):
        p = os.path.join(go_copy, "client.go")
        _corrupt(p, "func New(", "func New((")
        errs = check_go_package(go_copy)
        assert any("unclosed" in e or "unmatched" in e
                   or "mismatched" in e for e in errs), errs

    def test_go_unterminated_raw_string(self, go_copy):
        p = os.path.join(go_copy, "client.go")
        with open(p, "a", encoding="utf-8") as fh:
            fh.write("\nvar broken = `no close\n")
        errs = check_go_package(go_copy)
        assert any("unterminated raw string" in e for e in errs), errs

    def test_go_renamed_method(self, go_copy):
        p = os.path.join(go_copy, "client.go")
        _corrupt(p, "func (c *Client) SearchHybrid(",
                 "func (c *Client) SearchHybridv2(")
        errs = check_go_package(go_copy)
        assert any("SearchHybrid" in e and "census" in e
                   for e in errs), errs

    def test_go_missing_package_decl(self, go_copy):
        p = os.path.join(go_copy, "client.go")
        _corrupt(p, "package cortex", "packag cortex")
        errs = check_go_package(go_copy)
        assert any("package declaration" in e for e in errs), errs


class TestLexerPrecision:
    """The gate must not cry wolf: brackets inside every literal kind
    are ignored, and TS regex-vs-division is resolved correctly (the
    shipped client uses `.replace(/\\/$/, "")`)."""

    def test_ts_brackets_in_literals_ignored(self):
        errs = []
        code = strip_ts(
            'const a = "}}"; const b = `)) ${x + "]"} ((`;\n'
            "const c = s.replace(/[)}]/g, ''); // }\n"
            "/* ( */ const d = 1 / 2; const e = a / b;\n",
            "t.ts", errs)
        assert errs == []
        assert check_balanced(code, "t.ts") == []

    def test_go_brackets_in_literals_ignored(self):
        errs = []
        code = strip_go(
            'var a = "}}"\nvar b = `((` // }\n'
            "/* ( */ var c = '}'\n", "t.go", errs)
        assert errs == []
        assert check_balanced(code, "t.go") == []

    def test_line_numbers_survive_stripping(self):
        errs = []
        code = strip_ts('const a = "x";\nconst b = {\n', "t.ts", errs)
        out = check_balanced(code, "t.ts")
        assert out and "t.ts:2" in out[0]


class TestGateRobustness:
    def test_missing_client_file_is_finding_not_crash(self, ts_copy,
                                                      go_copy):
        os.remove(os.path.join(ts_copy, "src", "client.ts"))
        errs = check_ts_package(ts_copy)
        assert any("client.ts missing" in e for e in errs), errs
        os.remove(os.path.join(go_copy, "client.go"))
        errs = check_go_package(go_copy)
        assert any("client.go missing" in e for e in errs), errs

    def test_bare_directory_import_rejected(self, ts_copy):
        os.makedirs(os.path.join(ts_copy, "src", "util"))
        p = os.path.join(ts_copy, "src", "index.ts")
        with open(p, "a", encoding="utf-8") as fh:
            fh.write('\nexport * from "./util";\n')
        errs = check_ts_package(ts_copy)
        assert any("unresolved import './util'" in e for e in errs), \
            errs
