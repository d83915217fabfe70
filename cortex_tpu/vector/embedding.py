"""Embedding services.

Parity surface: the reference `EmbeddingService` trait
(crates/cortex-core/src/vector/embedding.rs:6-18) and the canonical
`embedding_input` node text format (embedding.rs:113-131):

    "{Kind}: {title}\\n{body}\\ntags: {t1, t2, ...}"

Implementations:
  * HashingEmbedder — deterministic hashed bag-of-{words, bigrams}
    projection, L2-normalized. No model weights, instant, fully
    reproducible: the default for tests and offline development (the
    reference's MockEmbedder role, but with real lexical-similarity
    structure so thresholds behave meaningfully).
  * STEmbedder — sentence-transformers (BGE-small-en-v1.5 class models)
    when weights are available locally; batch-embeds on the accelerator.

Batching discipline: embed_batch is THE hot path (the reference is
embedding-bound at ~30ms/node, ARCHITECTURE.md:78); all engine call
sites batch texts and call embed_batch once.
"""

from __future__ import annotations

import abc
import hashlib
import os
import re
from typing import List, Optional, Sequence

import numpy as np

from ..errors import EmbeddingError
from ..types import Node, kind_display

_WORD_RE = re.compile(r"[a-z0-9]+")

#: model name -> dimension map (parity: embedding.rs:43-50)
MODEL_DIMS = {
    "BAAI/bge-small-en-v1.5": 384,
    "sentence-transformers/all-MiniLM-L6-v2": 384,
    "BAAI/bge-base-en-v1.5": 768,
    "BAAI/bge-large-en-v1.5": 1024,
    "hash-384": 384,
    "hash-768": 768,
}


def embedding_input(node: Node) -> str:
    """Canonical node -> text mapping; keep byte-for-byte stable."""
    return (f"{kind_display(node.kind)}: {node.title}\n"
            f"{node.body}\n"
            f"tags: {', '.join(node.tags)}")


class EmbeddingService(abc.ABC):
    @abc.abstractmethod
    def embed(self, text: str) -> np.ndarray: ...

    @abc.abstractmethod
    def embed_batch(self, texts: Sequence[str]) -> np.ndarray: ...

    @property
    @abc.abstractmethod
    def dimension(self) -> int: ...

    @property
    @abc.abstractmethod
    def model_name(self) -> str: ...

    def embed_node(self, node: Node) -> np.ndarray:
        return self.embed(embedding_input(node))

    def embed_nodes(self, nodes: Sequence[Node]) -> np.ndarray:
        return self.embed_batch([embedding_input(n) for n in nodes])


class HashingEmbedder(EmbeddingService):
    """Feature-hashed unigram+bigram embedding with signed buckets.

    Deterministic across processes (blake2b-seeded), cosine similarity
    tracks lexical overlap, orthogonal-ish for unrelated text.
    """

    def __init__(self, dim: int = 384, name: Optional[str] = None):
        if dim <= 0:
            raise EmbeddingError("dim must be positive")
        self._dim = dim
        self._name = name or f"hash-{dim}"

    @property
    def dimension(self) -> int:
        return self._dim

    @property
    def model_name(self) -> str:
        return self._name

    def _tokens(self, text: str) -> List[str]:
        words = _WORD_RE.findall(text.lower())
        bigrams = [f"{a}_{b}" for a, b in zip(words, words[1:])]
        return words + bigrams

    def embed(self, text: str) -> np.ndarray:
        v = np.zeros(self._dim, dtype=np.float32)
        for tok in self._tokens(text):
            h = hashlib.blake2b(tok.encode(), digest_size=8).digest()
            x = int.from_bytes(h, "little")
            idx = x % self._dim
            sign = 1.0 if (x >> 63) & 1 else -1.0
            v[idx] += sign
        n = np.linalg.norm(v)
        if n < 1e-12:
            # empty text: deterministic unit vector
            v[0] = 1.0
            return v
        return v / n

    def embed_batch(self, texts: Sequence[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self._dim), dtype=np.float32)
        return np.stack([self.embed(t) for t in texts])


class STEmbedder(EmbeddingService):
    """sentence-transformers model (BGE/MiniLM class). Requires locally
    cached weights — this environment has zero egress, so construction
    fails with a clear error if the model isn't on disk."""

    def __init__(self, model_name: str = "BAAI/bge-small-en-v1.5",
                 device: str = "cpu"):
        try:
            # sentence_transformers silently RANDOM-INITIALIZES a model
            # when the name looks like a known architecture but no
            # weights are cached ("No modules.json found ...") — which
            # would mean garbage, per-process-different embeddings.
            # Require actual weights: a local model directory, or a
            # cached hub snapshot.
            import os as _os
            if not _os.path.isdir(model_name):
                from huggingface_hub import snapshot_download
                snapshot_download(model_name, local_files_only=True)
            from sentence_transformers import SentenceTransformer
            self._model = SentenceTransformer(model_name, device=device,
                                              local_files_only=True)
        except Exception as e:  # noqa: BLE001
            raise EmbeddingError(
                f"cannot load {model_name} (offline?): {e}") from e
        self._name = model_name
        self._dim = int(self._model.get_sentence_embedding_dimension())

    @property
    def dimension(self) -> int:
        return self._dim

    @property
    def model_name(self) -> str:
        return self._name

    def embed(self, text: str) -> np.ndarray:
        return self.embed_batch([text])[0]

    def embed_batch(self, texts: Sequence[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self._dim), dtype=np.float32)
        out = self._model.encode(list(texts), normalize_embeddings=True,
                                 convert_to_numpy=True)
        return out.astype(np.float32)


class JaxEncoderEmbedder(EmbeddingService):
    """Device-side BERT-class encoder (cortex_tpu.models.encoder): the
    whole embed step runs batched on the MXU under one jit — the TPU
    answer to the reference's ~30ms/text CPU ONNX bottleneck
    (ARCHITECTURE.md:78).

    `weights_npz` is a converted checkpoint (models.encoder.save_npz);
    `tokenizer` is a HF tokenizer path/name (loaded offline-only) or a
    callable texts -> (input_ids, attention_mask). Sequence lengths are
    bucketed to powers of two so jit caches stay warm.
    """

    BUCKETS = (32, 64, 128, 256, 512)

    def __init__(self, weights_npz: str, tokenizer=None,
                 name: Optional[str] = None):
        from ..models.encoder import (device_params, load_npz,
                                      load_npz_tokenizer)
        params, self._cfg = load_npz(weights_npz)
        self._params = device_params(params)   # one-time device upload
        self._name = name or f"flax:{weights_npz}"
        if callable(tokenizer):
            self._tok = tokenizer
        elif tokenizer is not None:
            # explicit tokenizer dir/name: prefer the in-repo WordPiece
            # (pure Python, offline); fall back to HF for non-BERT
            # tokenizer formats
            self._tok = self._load_dir_tokenizer(tokenizer)
        else:
            # zero-dependency path: the converted npz embeds its vocab
            # (models/convert.py) and the in-repo WordPiece serves it
            wp = load_npz_tokenizer(weights_npz)
            if wp is None:
                raise EmbeddingError(
                    f"{weights_npz} has no embedded vocab (pre-r3 "
                    "conversion?) — re-run cortex_tpu.models.convert or "
                    "pass tokenizer= explicitly")
            self._tok = self._wrap_wordpiece(wp)

    def _wrap_wordpiece(self, wp):
        def _tok(texts):
            return wp.encode_batch(list(texts),
                                   max_length=self._cfg.max_position)
        return _tok

    def _load_dir_tokenizer(self, tokenizer):
        import os
        if (os.path.isdir(tokenizer)
                and os.path.exists(os.path.join(tokenizer, "vocab.txt"))):
            from ..models.tokenizer import WordPieceTokenizer
            return self._wrap_wordpiece(
                WordPieceTokenizer.from_model_dir(tokenizer))
        try:
            from transformers import AutoTokenizer
            hf = AutoTokenizer.from_pretrained(tokenizer,
                                               local_files_only=True)
        except Exception as e:  # noqa: BLE001
            raise EmbeddingError(
                f"cannot load tokenizer {tokenizer}: {e}") from e

        def _hf_tok(texts):
            enc = hf(list(texts), padding=True, truncation=True,
                     max_length=self._cfg.max_position,
                     return_tensors="np")
            return enc["input_ids"], enc["attention_mask"]
        return _hf_tok

    @property
    def dimension(self) -> int:
        return self._cfg.hidden

    @property
    def model_name(self) -> str:
        return self._name

    def _bucket(self, s: int) -> int:
        for b in self.BUCKETS:
            if s <= b:
                return b
        return self.BUCKETS[-1]

    def embed(self, text: str) -> np.ndarray:
        return self.embed_batch([text])[0]

    def embed_batch(self, texts: Sequence[str]) -> np.ndarray:
        from ..models.encoder import bert_encode
        if not texts:
            return np.zeros((0, self.dimension), dtype=np.float32)
        ids, mask = self._tok(texts)
        ids = np.asarray(ids)[:, :self._cfg.max_position]
        mask = np.asarray(mask)[:, :self._cfg.max_position]
        b = self._bucket(ids.shape[1])
        if ids.shape[1] < b:
            pad = b - ids.shape[1]
            ids = np.pad(ids, ((0, 0), (0, pad)))
            mask = np.pad(mask, ((0, 0), (0, pad)))
        # bucket the BATCH dim too: a write-admission wave has an
        # arbitrary node count, and every distinct count would compile
        # its own (expensive) encoder program — same churn class as
        # shard._bucket_rows. Pad by REPEATING the last sequence (a
        # valid row; an all-zero attention mask would softmax NaN) and
        # slice the copies back off.
        n = ids.shape[0]
        nb = 1
        while nb < n:
            nb *= 2
        if nb != n:
            reps = np.repeat(ids[-1:], nb - n, axis=0)
            ids = np.concatenate([ids, reps])
            mask = np.concatenate([mask, np.repeat(mask[-1:],
                                                   nb - n, axis=0)])
        out = bert_encode(self._params, self._cfg, ids, mask)
        return np.asarray(out)[:n]


def _model_cache_dir() -> str:
    return os.environ.get(
        "CORTEX_MODEL_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "cortex_tpu"))


def _device_embedder_for(model: str) -> Optional[EmbeddingService]:
    """Serve an HF model name from the DEVICE encoder when its weights
    exist locally: use a previously converted npz from the model cache,
    or auto-convert a local HF snapshot once (r1 VERDICT #2 — the
    flax path is the serving default whenever weights exist)."""
    from ..models.convert import convert, resolve_local_model
    src = resolve_local_model(model)
    slug = re.sub(r"[^a-zA-Z0-9_.-]+", "--", model)
    npz = os.path.join(_model_cache_dir(), f"{slug}.npz")
    try:
        if not os.path.exists(npz):
            if src is None:
                return None          # no weights anywhere on disk
            os.makedirs(_model_cache_dir(), exist_ok=True)
            convert(model, npz)
        if src is None:
            return None              # npz without tokenizer is unusable
        # name by the logical model, not the cache path, so linker
        # config-change detection stays stable across machines
        return JaxEncoderEmbedder(npz, tokenizer=src, name=f"flax:{model}")
    except (EmbeddingError, OSError):
        return None


def default_embedder(model: str = "", dim: int = 384) -> EmbeddingService:
    """Build the configured embedder; fall back to hashing when model
    weights are unavailable (offline envs).

    Model schemes: "hash"/"hash-<dim>" (deterministic),
    "flax:<weights.npz>[::<tokenizer>]" (device encoder). Any other
    name is treated as an HF model: if its weights exist locally they
    are converted once and served from the device encoder; otherwise
    sentence-transformers is tried; otherwise hashing.
    """
    if model.startswith("flax:"):
        spec = model[len("flax:"):]
        weights, _, tok = spec.partition("::")
        try:
            return JaxEncoderEmbedder(weights, tokenizer=tok or None)
        except EmbeddingError:
            pass
    elif model and not model.startswith("hash"):
        dev = _device_embedder_for(model)
        if dev is not None:
            return dev
        try:
            return STEmbedder(model)
        except EmbeddingError:
            pass
    if model.startswith("hash-"):
        dim = int(model.split("-", 1)[1])
    return HashingEmbedder(dim=dim)
