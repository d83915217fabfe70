"""In-image contract for the real-model CI proof (VERDICT r3 #4).

The zero-egress image can't hold BGE weights, so the *measurement*
runs in CI (.github/workflows/real-model.yml). What CAN run here, and
does on every test run: (a) the committed fixtures are coherent, and
(b) the whole proof harness executes end-to-end against a synthesized
random-weight checkpoint — conversion, tokenizer parity (exact match
vs transformers), encoder parity (cosine vs torch), and the serving-
recall machinery — so a harness regression is caught in-image, not on
the first CI run.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = os.path.join(REPO, "tests", "fixtures")


class TestFixtureCoherence:
    def test_battery_parses_and_is_diverse(self):
        with open(os.path.join(FIX, "real_model_battery.json"),
                  encoding="utf-8") as fh:
            b = json.load(fh)
        assert len(b["parity_sentences"]) >= 20
        assert len(set(b["parity_sentences"])) == \
            len(b["parity_sentences"])
        # edge-case coverage: accents, CJK, long text
        joined = " ".join(b["parity_sentences"])
        assert any(ord(c) > 0x4E00 for c in joined), "needs CJK"
        assert any(0xC0 <= ord(c) <= 0x17F for c in joined), \
            "needs accented latin"
        assert max(len(s) for s in b["parity_sentences"]) > 150
        for t in b["semantic_triples"]:
            assert len(t) == 3 and all(isinstance(x, str) for x in t)
        assert len(b["semantic_triples"]) >= 10

    def test_expected_floors_coherent(self):
        with open(os.path.join(FIX, "real_model_expected.json"),
                  encoding="utf-8") as fh:
            e = json.load(fh)
        f = e["floors"]
        assert f["tokenizer_exact_match"] == 1.0
        assert 0.99 <= f["encoder_cosine_min"] < 1.0
        assert 0.5 < f["semantic_triple_accuracy"] <= 1.0
        assert 0.9 <= f["recall_quant_at10"] <= 1.0
        assert 0.5 <= f["recall_ivf_at10"] <= 1.0
        assert e["recall_corpus_sentences"] >= 10000
        assert 0.9 <= e["ivf_target_recall"] < 1.0
        assert e["model"] == "BAAI/bge-small-en-v1.5"

    def test_workflow_exists_and_references_harness(self):
        wf = os.path.join(REPO, ".github", "workflows",
                          "real-model.yml")
        with open(wf, encoding="utf-8") as fh:
            src = fh.read()
        assert "tools/real_model_proof.py" in src
        assert "BAAI/bge-small-en-v1.5" in src


@pytest.mark.slow
class TestHarnessSelfTest:
    def test_proof_harness_runs_offline(self, tmp_path):
        """Full harness on a synthesized random-weight checkpoint:
        conversion + exact tokenizer parity + encoder parity + the
        recall machinery, exit 0."""
        # the harness synthesizes its checkpoint with torch +
        # transformers — absent in minimal CI installs (the main test
        # job installs neither); every other torch-dependent test
        # guards the same way (tests/test_models.py)
        pytest.importorskip("torch")
        pytest.importorskip("transformers")
        out = str(tmp_path / "results.json")
        proc = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "tools", "real_model_proof.py"),
             "--self-test", "--out", out],
            capture_output=True, text=True, timeout=600, cwd=REPO)
        assert proc.returncode == 0, proc.stderr[-3000:]
        with open(out, encoding="utf-8") as fh:
            r = json.load(fh)
        # structural floors actually bound on the self-test
        assert r["tokenizer_exact_match"] == 1.0
        assert r["encoder_cosine_min"] >= 0.999
        # recall machinery ran and produced sane values
        assert 0.0 <= r["recall_quant_at10"] <= 1.0
        assert 0.0 <= r["recall_ivf_at10"] <= 1.0
        assert r["recall_corpus_size"] >= 1000
        assert r["failures"] == []
