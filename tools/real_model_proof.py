"""Real-model semantic proof (VERDICT r3 #4 / CI job real-model.yml).

The reference works out of the box with real BGE-small embeddings
(crates/cortex-core/src/vector/embedding.rs:34-131 — fastembed bundles
model + tokenizer). This repo's path is code-complete (encoder +
WordPiece + npz conversion) but the zero-egress build image holds no
weights, so semantic quality could only ever be *argued* in-image.
This harness turns the argument into a measurement on any machine
that has the weights (the CI workflow downloads them):

  1. convert  — HF checkpoint -> encoder npz (models/convert.py)
  2. tokenizer parity — in-repo WordPiece vs transformers
     AutoTokenizer, exact input_ids match over the committed battery
     (tests/fixtures/real_model_battery.json)
  3. encoder parity — JaxEncoderEmbedder vs the torch forward,
     per-sentence cosine over the same battery
  4. semantic sanity — committed (anchor, related, unrelated)
     triples: cos(a,r) > cos(a,u) (REAL weights only; random-weight
     self-tests skip this — no semantics to find)
  5. serving recall on true embeddings — harvested real sentences
     embedded with the converted model, quant-path and IVF-path
     recall@10 vs the exact fp32 oracle (the engine's own indexes)

Results are written as JSON and diffed against the committed floors
in tests/fixtures/real_model_expected.json; any breach exits nonzero.
The harness itself is exercised offline by
tests/test_real_model_contract.py on a synthesized random-weight
checkpoint, so CI cannot be the first place it ever runs.

Usage:
  python tools/real_model_proof.py --model BAAI/bge-small-en-v1.5 \
      --out real_model_results.json
  python tools/real_model_proof.py --self-test   # offline harness check
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURES = os.path.join(REPO, "tests", "fixtures")
BATTERY = os.path.join(FIXTURES, "real_model_battery.json")
EXPECTED = os.path.join(FIXTURES, "real_model_expected.json")


def _load(path: str) -> dict:
    with open(path, encoding="utf-8") as fh:
        return json.load(fh)


def check_tokenizer_parity(model_dir: str, sentences: list) -> dict:
    """Exact input_ids agreement: in-repo WordPiece vs transformers."""
    from transformers import AutoTokenizer

    from cortex_tpu.models.tokenizer import WordPieceTokenizer
    ours = WordPieceTokenizer.from_model_dir(model_dir)
    hf = AutoTokenizer.from_pretrained(model_dir, local_files_only=True)
    match = 0
    mismatches = []
    for s in sentences:
        a = ours.encode(s, max_length=128)
        b = list(hf(s, truncation=True, max_length=128)["input_ids"])
        if a == b:
            match += 1
        elif len(mismatches) < 5:
            mismatches.append({"text": s[:60], "ours": a[:16],
                               "hf": b[:16]})
    return {"tokenizer_exact_match": match / len(sentences),
            "tokenizer_mismatches": mismatches}


def check_encoder_parity(model_dir: str, npz: str,
                         sentences: list) -> dict:
    """Per-sentence cosine: our device encoder vs the torch forward
    with the model's own pooling convention."""
    import torch
    from transformers import AutoModel, AutoTokenizer

    from cortex_tpu.models.convert import default_pooling
    from cortex_tpu.vector.embedding import JaxEncoderEmbedder

    emb = JaxEncoderEmbedder(npz, tokenizer=model_dir)
    ours = emb.embed_batch(sentences)

    hf_tok = AutoTokenizer.from_pretrained(model_dir,
                                           local_files_only=True)
    hf = AutoModel.from_pretrained(model_dir, local_files_only=True)
    hf.eval()
    max_len = min(512, int(hf.config.max_position_embeddings))
    enc = hf_tok(sentences, padding=True, truncation=True,
                 max_length=max_len, return_tensors="pt")
    with torch.no_grad():
        hidden = hf(**enc).last_hidden_state.numpy()
    mask = enc["attention_mask"].numpy()[:, :, None].astype(np.float32)
    if default_pooling(model_dir) == "mean":
        ref = (hidden * mask).sum(1) / np.maximum(mask.sum(1), 1e-9)
    else:
        ref = hidden[:, 0, :]
    ref = ref / np.maximum(
        np.linalg.norm(ref, axis=-1, keepdims=True), 1e-12)
    cos = np.sum(ours * ref, axis=-1)
    return {"encoder_cosine_min": float(cos.min()),
            "encoder_cosine_mean": float(cos.mean())}


def check_semantic_triples(npz: str, model_dir: str,
                           triples: list) -> dict:
    from cortex_tpu.vector.embedding import JaxEncoderEmbedder
    emb = JaxEncoderEmbedder(npz, tokenizer=model_dir)
    flat = [t for triple in triples for t in triple]
    v = emb.embed_batch(flat).reshape(len(triples), 3, -1)
    ok = int(np.sum(np.einsum("td,td->t", v[:, 0], v[:, 1])
                    > np.einsum("td,td->t", v[:, 0], v[:, 2])))
    return {"semantic_triple_accuracy": ok / len(triples),
            "semantic_triples_total": len(triples)}


def check_serving_recall(npz: str, model_dir: str, n_corpus: int,
                         ivf_target_recall: float) -> dict:
    """Recall@10 of the engine's serving indexes on TRUE embeddings of
    real harvested text, vs the exact fp32 oracle."""
    sys.path.insert(0, os.path.join(REPO, "benches"))
    from semantic_recall_study import harvest_sentences

    from cortex_tpu.vector import TpuFlatIndex, TpuIvfIndex
    from cortex_tpu.vector.embedding import JaxEncoderEmbedder

    emb = JaxEncoderEmbedder(npz, tokenizer=model_dir)
    nq = 64
    texts = harvest_sentences(n_corpus + nq)
    if len(texts) < 256 + nq:
        raise RuntimeError(
            f"harvested only {len(texts)} sentences — corpus too "
            f"small for a meaningful recall figure")
    qs_t, corpus_t = texts[:nq], texts[nq:]
    corpus = emb.embed_batch(corpus_t)
    queries = emb.embed_batch(qs_t)
    ids = [f"s{i:06d}" for i in range(len(corpus))]

    # fp32-exact oracle (numpy: modest sizes in CI)
    scores = queries @ corpus.T
    oracle = np.argsort(-scores, axis=1)[:, :10]
    truth = [set(ids[j] for j in row) for row in oracle]

    out = {"recall_corpus_size": len(corpus)}
    quant = TpuFlatIndex(corpus.shape[1], search_path="quant")
    quant.insert_batch(ids, corpus)
    got = quant.search_batch(queries, 10)
    out["recall_quant_at10"] = float(np.mean(
        [len({i for i, _ in row if i} & truth[r]) / 10
         for r, row in enumerate(got)]))

    ivf = TpuIvfIndex(corpus.shape[1],
                      target_recall=ivf_target_recall)
    ivf.insert_batch(ids, corpus)
    ivf._corpus.sync()
    got = ivf.search_batch(queries, 10)
    out["recall_ivf_at10"] = float(np.mean(
        [len({i for i, _ in row if i} & truth[r]) / 10
         for r, row in enumerate(got)]))
    out["ivf_info"] = {k: v for k, v in ivf.index_info().items()
                       if k in ("nlist", "nprobe", "nprobe_tuned",
                                "tune_curve", "size")}
    return out


def make_self_test_model(tmp_dir: str) -> str:
    """Synthesize a tiny random-weight HF BERT checkpoint + WordPiece
    vocab so the harness runs end-to-end with zero network access."""
    import torch
    from transformers import BertConfig, BertModel, BertTokenizer

    cfg = BertConfig(vocab_size=200, hidden_size=32,
                     num_hidden_layers=2, num_attention_heads=2,
                     intermediate_size=64,
                     max_position_embeddings=128, hidden_act="gelu",
                     attention_probs_dropout_prob=0.0,
                     hidden_dropout_prob=0.0)
    torch.manual_seed(11)
    model = BertModel(cfg, add_pooling_layer=False)
    model.save_pretrained(tmp_dir)
    # vocab: specials + common english pieces + suffix pieces so real
    # sentences wordpiece non-trivially
    words = ("the a and of to in is it on for with cat dog sat window"
             " quick brown fox jump over lazy sentence test word one"
             " two three").split()
    pieces = ["##s", "##ing", "##ed", "##er", "##ly", "##e", "##t",
              "##a", "##o", "##n", "##i", "##r", "##d", "##m"]
    letters = list("abcdefghijklmnopqrstuvwxyz0123456789")
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
             + words + pieces + letters
             + ["##" + c for c in letters])
    vocab += [f"unused{i}" for i in range(cfg.vocab_size - len(vocab))]
    with open(os.path.join(tmp_dir, "vocab.txt"), "w",
              encoding="utf-8") as fh:
        fh.write("\n".join(vocab[:cfg.vocab_size]) + "\n")
    BertTokenizer.from_pretrained(
        tmp_dir, local_files_only=True).save_pretrained(tmp_dir)
    return tmp_dir


def run_proof(model: str, out_path: str, expected_path: str,
              self_test: bool = False) -> int:
    from cortex_tpu.models.convert import convert

    battery = _load(BATTERY)
    expected = _load(expected_path)
    floors = dict(expected["floors"])
    results = {"model": model, "self_test": self_test}

    if self_test:
        import tempfile
        td = tempfile.mkdtemp(prefix="real-model-selftest-")
        model = make_self_test_model(td)
        results["model"] = "synthesized-tiny-bert (random weights)"
        # random weights carry no semantics, and a random tiny-width
        # encoder produces tie-dense degenerate geometry (all cosines
        # ~1) that defeats ANY candidate generator — keep only the
        # structural floors here; the recall keys must still EXIST
        # and be sane (the machinery ran), proven below. Real floors
        # bind in CI on real weights; realistic-geometry recall
        # coverage in-image lives in benches/semantic_recall_study.py
        # and tests/test_ivf*.py.
        floors.pop("semantic_triple_accuracy")
        floors["recall_quant_at10"] = 0.0
        floors["recall_ivf_at10"] = 0.0
        n_corpus = 2000
    else:
        n_corpus = int(expected.get("recall_corpus_sentences", 20000))

    npz = os.path.join(os.path.dirname(out_path) or ".",
                       "converted_model.npz")
    src, cfg = convert(model, npz)
    results["encoder_config"] = {"hidden": cfg.hidden,
                                 "layers": cfg.layers,
                                 "pooling": cfg.pooling}

    results.update(check_tokenizer_parity(
        src, battery["parity_sentences"]))
    results.update(check_encoder_parity(
        src, npz, battery["parity_sentences"]))
    if not self_test:
        results.update(check_semantic_triples(
            npz, src, battery["semantic_triples"]))
    results.update(check_serving_recall(
        npz, src, n_corpus,
        float(expected.get("ivf_target_recall", 0.95))))

    failures = []
    for key, floor in floors.items():
        got = results.get(key)
        if got is None:
            failures.append(f"{key}: MISSING (floor {floor})")
        elif got < floor:
            failures.append(f"{key}: {got:.4f} < floor {floor}")
    results["floors"] = floors
    results["failures"] = failures

    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(results, fh, indent=2)
    for k in ("tokenizer_exact_match", "encoder_cosine_min",
              "semantic_triple_accuracy", "recall_quant_at10",
              "recall_ivf_at10"):
        if k in results:
            print(f"{k}: {results[k]:.4f}")
    if failures:
        print("FAIL:\n  " + "\n  ".join(failures), file=sys.stderr)
        return 1
    print(f"real-model proof OK -> {out_path}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="BAAI/bge-small-en-v1.5")
    ap.add_argument("--out", default="real_model_results.json")
    ap.add_argument("--expected", default=EXPECTED)
    ap.add_argument("--self-test", action="store_true",
                    help="synthesize a tiny random-weight checkpoint "
                         "and run the full harness offline (semantic "
                         "floors skipped)")
    args = ap.parse_args()
    return run_proof(args.model, args.out, args.expected,
                     self_test=args.self_test)


if __name__ == "__main__":
    sys.exit(main())
