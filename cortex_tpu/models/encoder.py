"""TPU-native text encoder: a BERT-class tower in pure JAX.

The reference embeds with fastembed/ONNX BGE-small-en-v1.5 on CPU
(~30ms per text — the linker's bottleneck, ARCHITECTURE.md:78,155;
vector/embedding.rs:34-57). This module is the device-side equivalent:
the exact BERT encoder architecture that BGE-small / MiniLM-class
models use, written as a functional JAX forward over a plain-dict
param pytree, so the whole embed step runs batched on the MXU under
one jit.

Weights: `convert_hf_state_dict` maps a HuggingFace `BertModel`
state_dict (torch) into the param pytree, and `save_npz`/`load_npz`
persist it. No weights ship with the framework (offline build); the
conversion path is verified numerically against torch in
tests/test_models.py with a random-initialized model.

Pooling: 'cls' (BGE-style) or 'mean' (MiniLM/sentence-transformers
style), both followed by L2 normalization.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BertEncoderConfig:
    vocab_size: int = 30522
    hidden: int = 384              # BGE-small-en-v1.5
    layers: int = 12
    heads: int = 12
    intermediate: int = 1536
    max_position: int = 512
    type_vocab: int = 2
    layernorm_eps: float = 1e-12
    pooling: str = "cls"           # 'cls' | 'mean'


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def init_params(cfg: BertEncoderConfig, seed: int = 0) -> Dict:
    """Random init (testing / from-scratch training)."""
    rng = np.random.default_rng(seed)

    def w(*shape):
        return rng.normal(0.0, 0.02, size=shape).astype(np.float32)

    def zeros(*shape):
        return np.zeros(shape, np.float32)

    def ones(*shape):
        return np.ones(shape, np.float32)

    p = {
        "word_emb": w(cfg.vocab_size, cfg.hidden),
        "pos_emb": w(cfg.max_position, cfg.hidden),
        "type_emb": w(cfg.type_vocab, cfg.hidden),
        "emb_ln_g": ones(cfg.hidden), "emb_ln_b": zeros(cfg.hidden),
        "layers": [],
    }
    for _ in range(cfg.layers):
        p["layers"].append({
            "q_w": w(cfg.hidden, cfg.hidden), "q_b": zeros(cfg.hidden),
            "k_w": w(cfg.hidden, cfg.hidden), "k_b": zeros(cfg.hidden),
            "v_w": w(cfg.hidden, cfg.hidden), "v_b": zeros(cfg.hidden),
            "attn_out_w": w(cfg.hidden, cfg.hidden),
            "attn_out_b": zeros(cfg.hidden),
            "attn_ln_g": ones(cfg.hidden), "attn_ln_b": zeros(cfg.hidden),
            "ffn_in_w": w(cfg.hidden, cfg.intermediate),
            "ffn_in_b": zeros(cfg.intermediate),
            "ffn_out_w": w(cfg.intermediate, cfg.hidden),
            "ffn_out_b": zeros(cfg.hidden),
            "ffn_ln_g": ones(cfg.hidden), "ffn_ln_b": zeros(cfg.hidden),
        })
    return p


def convert_hf_state_dict(state_dict, cfg: BertEncoderConfig) -> Dict:
    """Map a HuggingFace `BertModel` (torch) state_dict to our pytree.
    torch Linear stores [out, in]; our forward does x @ W, so transpose.
    """
    def t(name):
        v = state_dict[name]
        try:
            v = v.detach().cpu().numpy()
        except AttributeError:
            v = np.asarray(v)
        return v.astype(np.float32)

    p = {
        "word_emb": t("embeddings.word_embeddings.weight"),
        "pos_emb": t("embeddings.position_embeddings.weight"),
        "type_emb": t("embeddings.token_type_embeddings.weight"),
        "emb_ln_g": t("embeddings.LayerNorm.weight"),
        "emb_ln_b": t("embeddings.LayerNorm.bias"),
        "layers": [],
    }
    for i in range(cfg.layers):
        pre = f"encoder.layer.{i}."
        p["layers"].append({
            "q_w": t(pre + "attention.self.query.weight").T,
            "q_b": t(pre + "attention.self.query.bias"),
            "k_w": t(pre + "attention.self.key.weight").T,
            "k_b": t(pre + "attention.self.key.bias"),
            "v_w": t(pre + "attention.self.value.weight").T,
            "v_b": t(pre + "attention.self.value.bias"),
            "attn_out_w": t(pre + "attention.output.dense.weight").T,
            "attn_out_b": t(pre + "attention.output.dense.bias"),
            "attn_ln_g": t(pre + "attention.output.LayerNorm.weight"),
            "attn_ln_b": t(pre + "attention.output.LayerNorm.bias"),
            "ffn_in_w": t(pre + "intermediate.dense.weight").T,
            "ffn_in_b": t(pre + "intermediate.dense.bias"),
            "ffn_out_w": t(pre + "output.dense.weight").T,
            "ffn_out_b": t(pre + "output.dense.bias"),
            "ffn_ln_g": t(pre + "output.LayerNorm.weight"),
            "ffn_ln_b": t(pre + "output.LayerNorm.bias"),
        })
    return p


def save_npz(path: str, params: Dict, cfg: BertEncoderConfig,
             vocab=None, do_lower_case: bool = True) -> None:
    """Serialize the encoder pytree (+ optionally the WordPiece vocab,
    making the npz a COMPLETE offline embedder — tokenizer included,
    see models.tokenizer)."""
    flat = {
        "_cfg": np.array([cfg.vocab_size, cfg.hidden, cfg.layers,
                          cfg.heads, cfg.intermediate, cfg.max_position,
                          cfg.type_vocab], np.int64),
        "_pooling": np.array([0 if cfg.pooling == "cls" else 1], np.int64),
        # eps must round-trip: checkpoints with layer_norm_eps=1e-5
        # would otherwise silently serve with the 1e-12 default and
        # diverge from the torch reference the conversion verified
        "_eps": np.array([cfg.layernorm_eps], np.float64),
    }
    if vocab is not None:
        flat["_vocab"] = np.array(list(vocab), dtype=np.str_)
        flat["_tok_lower"] = np.array([1 if do_lower_case else 0],
                                      np.int64)
    for k, v in params.items():
        if k == "layers":
            for i, lyr in enumerate(v):
                for lk, lv in lyr.items():
                    flat[f"layer{i}.{lk}"] = lv
        else:
            flat[k] = v
    np.savez_compressed(path, **flat)


def load_npz(path: str):
    z = np.load(path)
    c = z["_cfg"]
    cfg = BertEncoderConfig(
        vocab_size=int(c[0]), hidden=int(c[1]), layers=int(c[2]),
        heads=int(c[3]), intermediate=int(c[4]), max_position=int(c[5]),
        type_vocab=int(c[6]),
        pooling="cls" if int(z["_pooling"][0]) == 0 else "mean",
        # older checkpoints predate _eps: they were produced from the
        # 1e-12 default, so the fallback is faithful for them
        layernorm_eps=(float(z["_eps"][0]) if "_eps" in z.files
                       else 1e-12))
    params = {"layers": [dict() for _ in range(cfg.layers)]}
    for k in z.files:
        if k.startswith("_"):
            continue
        if k.startswith("layer"):
            idx, lk = k.split(".", 1)
            params["layers"][int(idx[5:])][lk] = z[k]
        else:
            params[k] = z[k]
    return params, cfg


def load_npz_tokenizer(path: str):
    """WordPieceTokenizer from the npz's embedded vocab, or None when
    the checkpoint predates vocab embedding."""
    z = np.load(path)
    if "_vocab" not in z.files:
        return None
    from .tokenizer import WordPieceTokenizer
    lower = bool(z["_tok_lower"][0]) if "_tok_lower" in z.files else True
    return WordPieceTokenizer([str(t) for t in z["_vocab"]],
                              do_lower_case=lower)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _layer_norm(x, g, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * g + b


def _encoder_layer(x, mask_bias, lp, heads, eps):
    b, s, h = x.shape
    dh = h // heads

    def split(y):
        return y.reshape(b, s, heads, dh).transpose(0, 2, 1, 3)

    q = split(x @ lp["q_w"] + lp["q_b"])
    k = split(x @ lp["k_w"] + lp["k_b"])
    v = split(x @ lp["v_w"] + lp["v_b"])
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
        jnp.float32(dh))
    scores = scores + mask_bias[:, None, None, :]
    attn = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h)
    x = _layer_norm(x + (ctx @ lp["attn_out_w"] + lp["attn_out_b"]),
                    lp["attn_ln_g"], lp["attn_ln_b"], eps)
    ffn = jax.nn.gelu(x @ lp["ffn_in_w"] + lp["ffn_in_b"],
                      approximate=False)
    x = _layer_norm(x + (ffn @ lp["ffn_out_w"] + lp["ffn_out_b"]),
                    lp["ffn_ln_g"], lp["ffn_ln_b"], eps)
    return x


@functools.partial(jax.jit, static_argnames=("heads", "eps", "pooling"))
def _forward(params, input_ids, attention_mask, *, heads: int,
             eps: float, pooling: str) -> jnp.ndarray:
    b, s = input_ids.shape
    pos = jnp.arange(s)[None, :]
    x = (params["word_emb"][input_ids]
         + params["pos_emb"][pos]
         + params["type_emb"][jnp.zeros_like(input_ids)])
    x = _layer_norm(x, params["emb_ln_g"], params["emb_ln_b"], eps)
    mask_bias = jnp.where(attention_mask > 0, 0.0, -1e30)
    for lp in params["layers"]:
        x = _encoder_layer(x, mask_bias, lp, heads, eps)
    if pooling == "cls":
        pooled = x[:, 0, :]
    else:
        m = attention_mask[:, :, None].astype(x.dtype)
        pooled = jnp.sum(x * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1e-9)
    return pooled / jnp.maximum(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)


def device_params(params: Dict) -> Dict:
    """Upload the param pytree to device arrays ONCE; reuse across
    calls (~130MB for BGE-small — re-uploading per batch would dwarf
    the compute)."""
    dev = {k: jnp.asarray(v) for k, v in params.items() if k != "layers"}
    dev["layers"] = tuple({k: jnp.asarray(v) for k, v in lyr.items()}
                          for lyr in params["layers"])
    return dev


def bert_encode(params: Dict, cfg: BertEncoderConfig,
                input_ids: np.ndarray,
                attention_mask: np.ndarray) -> np.ndarray:
    """[B, S] int32 ids + mask -> [B, hidden] L2-normalized embeddings,
    one jitted device call. Pass `device_params(params)` when calling
    repeatedly; raw numpy pytrees are converted (and re-uploaded) per
    call."""
    if not isinstance(params.get("layers"), tuple):
        params = device_params(params)
    out = _forward(params, jnp.asarray(input_ids, jnp.int32),
                   jnp.asarray(attention_mask, jnp.int32),
                   heads=cfg.heads, eps=cfg.layernorm_eps,
                   pooling=cfg.pooling)
    # watchdogged fetch: a lost remote-device response must fail the
    # embed (callers retry / surface an error) rather than hang the
    # admission path forever (vector.shard._fetch_array semantics)
    from ..vector import fetch_array as _fetch_array
    return _fetch_array(out)
