"""In-repo WordPiece tokenizer: parity with transformers.BertTokenizer
(the reference implementation, constructed from a LOCAL vocab file — no
network) and the zero-dependency npz serving path (VERDICT r2 #3)."""

import numpy as np
import pytest

from cortex_tpu.models.tokenizer import WordPieceTokenizer

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] "
    "the a an and deploy pipeline green suite integration agents batch "
    "write writes gate rejects search latency index cold goal recall "
    "un ##able ##writ ##able ##s ##ing ##ed play ##ful task cafe "
    ", . ! ? ' \" - ( ) : ; 1 2 3 ##1 ##2 ##3 中 文"
).split()

BATTERY = [
    "The deploy pipeline requires a green integration suite",
    "agents batch writes, gate rejects!",
    "playful playing played unable",
    "café CAFE Café",                 # accents + casing
    "中文 tokens mixed with english",   # CJK spacing
    "punctuation...everywhere?!(yes);",
    "emoji \U0001f680 unknown ☃ chars",
    "123 12 321",
    "",
    "   \t\n whitespace   mess \r\n",
    "x" * 150,                                  # > max_input_chars_per_word
    "word-with-dashes and don't",
]


@pytest.fixture(scope="module")
def reference_tok(tmp_path_factory):
    from transformers import BertTokenizer
    d = tmp_path_factory.mktemp("vocab")
    vocab = d / "vocab.txt"
    vocab.write_text("\n".join(dict.fromkeys(VOCAB)) + "\n")
    return BertTokenizer(vocab_file=str(vocab))


@pytest.fixture(scope="module")
def ours():
    return WordPieceTokenizer(list(dict.fromkeys(VOCAB)))


class TestParityWithTransformers:
    def test_tokenize_battery(self, reference_tok, ours):
        for text in BATTERY:
            assert ours.tokenize(text) == reference_tok.tokenize(text), text

    def test_encode_battery(self, reference_tok, ours):
        for text in BATTERY:
            ref = reference_tok.encode(text, truncation=True, max_length=32)
            assert ours.encode(text, max_length=32) == ref, text

    def test_batch_padding_matches(self, reference_tok, ours):
        enc = reference_tok(BATTERY[:6], padding=True, truncation=True,
                            max_length=64, return_tensors="np")
        ids, mask = ours.encode_batch(BATTERY[:6], max_length=64)
        np.testing.assert_array_equal(ids, enc["input_ids"].astype(np.int32))
        np.testing.assert_array_equal(mask,
                                      enc["attention_mask"].astype(np.int32))

    def test_cased_mode(self, tmp_path):
        from transformers import BertTokenizer
        vocab = tmp_path / "v.txt"
        toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "Deploy", "deploy",
                "Café"]
        vocab.write_text("\n".join(toks) + "\n")
        ref = BertTokenizer(vocab_file=str(vocab), do_lower_case=False)
        wp = WordPieceTokenizer(toks, do_lower_case=False)
        for text in ("Deploy deploy", "Café deploy", "DEPLOY"):
            assert wp.tokenize(text) == ref.tokenize(text), text


class TestNpzServingPath:
    def test_vocab_roundtrip_through_npz(self, tmp_path, ours):
        from cortex_tpu.models.encoder import (BertEncoderConfig,
                                               init_params,
                                               load_npz_tokenizer,
                                               save_npz)
        cfg = BertEncoderConfig(vocab_size=len(ours.vocab), hidden=32,
                                layers=1, heads=2, intermediate=64,
                                max_position=64, type_vocab=2)
        path = str(tmp_path / "m.npz")
        save_npz(path, init_params(cfg, seed=1), cfg,
                 vocab=ours.vocab_list, do_lower_case=True)
        wp = load_npz_tokenizer(path)
        for text in BATTERY:
            assert wp.tokenize(text) == ours.tokenize(text)

    def test_pre_r3_npz_without_vocab_errors_clearly(self, tmp_path):
        from cortex_tpu.errors import EmbeddingError
        from cortex_tpu.models.encoder import (BertEncoderConfig,
                                               init_params, save_npz)
        from cortex_tpu.vector.embedding import JaxEncoderEmbedder
        cfg = BertEncoderConfig(vocab_size=64, hidden=32, layers=1,
                                heads=2, intermediate=64, max_position=64,
                                type_vocab=2)
        path = str(tmp_path / "old.npz")
        save_npz(path, init_params(cfg, seed=1), cfg)   # no vocab
        with pytest.raises(EmbeddingError, match="embedded vocab"):
            JaxEncoderEmbedder(path)

    def test_embedder_constructs_from_single_npz(self, tmp_path, ours):
        """The complete offline serving path: ONE file, no tokenizer
        argument, no HF at runtime — tokenize -> encode -> normalized
        embeddings."""
        from cortex_tpu.models.encoder import (BertEncoderConfig,
                                               init_params, save_npz)
        from cortex_tpu.vector.embedding import JaxEncoderEmbedder
        cfg = BertEncoderConfig(vocab_size=len(ours.vocab), hidden=32,
                                layers=1, heads=2, intermediate=64,
                                max_position=64, type_vocab=2)
        path = str(tmp_path / "m.npz")
        save_npz(path, init_params(cfg, seed=2), cfg,
                 vocab=ours.vocab_list)
        emb = JaxEncoderEmbedder(path)
        out = emb.embed_batch(["the deploy pipeline", "agents batch"])
        assert out.shape == (2, 32)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0,
                                   atol=1e-5)
        # deterministic + tokenizer-sensitive: distinct texts differ
        assert not np.allclose(out[0], out[1])
        again = emb.embed_batch(["the deploy pipeline"])
        np.testing.assert_allclose(out[0], again[0], atol=1e-6)


class TestFullPipelineWithEmbeddedVocab:
    def test_convert_embeds_vocab_and_matches_hf_tokenization(
            self, tmp_path):
        """models.convert on an HF snapshot embeds the snapshot's vocab;
        the resulting single-file embedder tokenizes identically to the
        snapshot's own HF tokenizer."""
        pytest.importorskip("torch")
        import torch
        from transformers import BertConfig, BertModel, BertTokenizerFast
        from cortex_tpu.models.convert import convert
        from cortex_tpu.models.encoder import load_npz_tokenizer

        d = tmp_path / "snap"
        d.mkdir()
        cfg = BertConfig(hidden_size=32, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=64,
                         vocab_size=len(dict.fromkeys(VOCAB)),
                         attention_probs_dropout_prob=0.0,
                         hidden_dropout_prob=0.0)
        torch.manual_seed(3)
        model = BertModel(cfg, add_pooling_layer=False)
        (d / "vocab.txt").write_text(
            "\n".join(dict.fromkeys(VOCAB)) + "\n")
        tok = BertTokenizerFast(vocab_file=str(d / "vocab.txt"))
        model.save_pretrained(d)
        tok.save_pretrained(d)

        npz = str(tmp_path / "m.npz")
        convert(str(d), npz)
        wp = load_npz_tokenizer(npz)
        assert wp is not None
        enc = tok(BATTERY[:8], padding=True, truncation=True,
                  max_length=64, return_tensors="np")
        ids, mask = wp.encode_batch(BATTERY[:8], max_length=64)
        np.testing.assert_array_equal(ids, enc["input_ids"].astype(np.int32))
        np.testing.assert_array_equal(
            mask, enc["attention_mask"].astype(np.int32))
