"""Device encoder tests: numerical parity with torch BertModel on a
random-initialized config (no downloads — verifies the architecture
and the HF weight-conversion path), checkpoint roundtrip, and the
EmbeddingService wrapper.
"""

import numpy as np
import pytest

from cortex_tpu.models import (BertEncoderConfig, bert_encode,
                               convert_hf_state_dict, init_params,
                               load_npz, save_npz)

TINY = BertEncoderConfig(vocab_size=100, hidden=32, layers=2, heads=2,
                         intermediate=64, max_position=64, pooling="cls")


def tiny_inputs(b=3, s=10, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, TINY.vocab_size, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    mask[1, 6:] = 0      # one padded row
    return ids, mask


class TestTorchParity:
    @pytest.fixture(scope="class")
    def torch_model(self):
        torch = pytest.importorskip("torch")
        from transformers import BertConfig, BertModel
        cfg = BertConfig(
            vocab_size=TINY.vocab_size, hidden_size=TINY.hidden,
            num_hidden_layers=TINY.layers,
            num_attention_heads=TINY.heads,
            intermediate_size=TINY.intermediate,
            max_position_embeddings=TINY.max_position,
            hidden_act="gelu", attention_probs_dropout_prob=0.0,
            hidden_dropout_prob=0.0)
        torch.manual_seed(7)
        model = BertModel(cfg, add_pooling_layer=False)
        model.eval()
        return model

    def test_forward_matches_torch(self, torch_model):
        import torch
        params = convert_hf_state_dict(torch_model.state_dict(), TINY)
        ids, mask = tiny_inputs()
        with torch.no_grad():
            ref = torch_model(
                input_ids=torch.tensor(ids.astype(np.int64)),
                attention_mask=torch.tensor(mask.astype(np.int64)),
            ).last_hidden_state.numpy()
        ref_cls = ref[:, 0, :]
        ref_cls = ref_cls / np.linalg.norm(ref_cls, axis=-1,
                                           keepdims=True)
        ours = bert_encode(params, TINY, ids, mask)
        np.testing.assert_allclose(ours, ref_cls, atol=2e-4)

    def test_mean_pooling_matches_torch(self, torch_model):
        import torch
        from dataclasses import replace
        cfg = replace(TINY, pooling="mean")
        params = convert_hf_state_dict(torch_model.state_dict(), cfg)
        ids, mask = tiny_inputs(seed=2)
        with torch.no_grad():
            ref = torch_model(
                input_ids=torch.tensor(ids.astype(np.int64)),
                attention_mask=torch.tensor(mask.astype(np.int64)),
            ).last_hidden_state.numpy()
        m = mask[:, :, None].astype(np.float32)
        pooled = (ref * m).sum(1) / np.maximum(m.sum(1), 1e-9)
        pooled = pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)
        ours = bert_encode(params, cfg, ids, mask)
        np.testing.assert_allclose(ours, pooled, atol=2e-4)


class TestCheckpoint:
    def test_npz_roundtrip(self, tmp_path):
        params = init_params(TINY, seed=1)
        path = str(tmp_path / "enc.npz")
        save_npz(path, params, TINY)
        p2, cfg2 = load_npz(path)
        assert cfg2 == TINY
        ids, mask = tiny_inputs(seed=3)
        np.testing.assert_allclose(bert_encode(params, TINY, ids, mask),
                                   bert_encode(p2, cfg2, ids, mask),
                                   atol=1e-6)

    def test_padding_invariance(self):
        """Extra padded positions must not change the embedding."""
        params = init_params(TINY, seed=4)
        ids, mask = tiny_inputs(b=2, s=8, seed=5)
        out1 = bert_encode(params, TINY, ids, mask)
        ids_p = np.pad(ids, ((0, 0), (0, 8)))
        mask_p = np.pad(mask, ((0, 0), (0, 8)))
        out2 = bert_encode(params, TINY, ids_p, mask_p)
        np.testing.assert_allclose(out1, out2, atol=1e-5)


class TestEmbedderWrapper:
    def test_flax_embedder_service(self, tmp_path):
        from cortex_tpu.vector.embedding import (JaxEncoderEmbedder,
                                                 default_embedder)
        params = init_params(TINY, seed=6)
        path = str(tmp_path / "enc.npz")
        save_npz(path, params, TINY)

        def toy_tokenizer(texts):
            ids = np.zeros((len(texts), 12), np.int32)
            mask = np.zeros((len(texts), 12), np.int32)
            for r, t in enumerate(texts):
                toks = [(hash(w) % (TINY.vocab_size - 1)) + 1
                        for w in t.split()][:12]
                ids[r, :len(toks)] = toks
                mask[r, :len(toks)] = 1
            return ids, mask

        emb = JaxEncoderEmbedder(path, tokenizer=toy_tokenizer)
        assert emb.dimension == TINY.hidden
        out = emb.embed_batch(["hello world", "another text here"])
        assert out.shape == (2, TINY.hidden)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0,
                                   atol=1e-5)
        # deterministic
        np.testing.assert_allclose(out[0], emb.embed("hello world"),
                                   atol=1e-6)
        # default_embedder falls back to hashing when tokenizer missing
        fb = default_embedder(f"flax:{path}")
        assert fb.model_name.startswith("hash")
