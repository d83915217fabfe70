"""Device-resident embedding corpus.

The TPU-native replacement for the reference's HNSW index state
(crates/cortex-core/src/vector/index.rs: `vectors: HashMap<NodeId,Vec<f32>>`
+ metadata maps + rebuilt HNSW graph). Layout:

    emb        [cap, d] float32   row-L2-normalized; zeros for dead rows
    live       [cap]    bool
    kind_code  [cap]    int32     interned node kind (-1 dead)
    agent_code [cap]    int32     interned source agent (-1 dead)

Host keeps an authoritative numpy mirror plus id<->row maps; the device
copy is refreshed lazily before a search:

  * small diffs  -> fused scatter update on device (jnp .at[rows].set)
  * big diffs / capacity growth -> full re-upload

This is the stale-index + rebuild model of the reference (index.rs:416-435)
re-expressed functionally: the device arrays are immutable values swapped
whole, so readers never see torn state and no locks exist
(SURVEY §2.4: "immutable device arrays + versioned swap").

Capacity grows by doubling along a fixed ladder so jit caches stay warm
across many inserts (recompiles amortize to O(log N)).
"""

from __future__ import annotations

import functools
import logging
import atexit
import os
import threading
import time
import weakref
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import IndexError_
from ..native import rerank_topk_native
from ..utils import tracing
from ..ops.similarity import (NEG_INF, cosine_topk_approx,
                              cosine_topk_quant, cosine_topk_quant_exact,
                              cosine_topk_xla, quantize_rows_centered)

MIN_CAP = 1024
#: Largest dirty-row scatter issued as one dispatch; bigger sets chunk.
#: Bounds the scatter program family to log2(MAX_SCATTER_ROWS) buckets
#: so capacity warm-ahead can pre-compile every one (an unseen bucket
#: compiles mid-serving under the corpus lock — measured as a ~29 s
#: outage at 1M rows through a tunneled device).
MAX_SCATTER_ROWS = 32768
# Watchdog for device result fetches: through a network-tunneled TPU a
# cold-compile fetch can (rarely) lose its response and block forever
# (observed: array._value wedged with an idle process; the identical
# program compiles in seconds on retry). Instead of np.asarray blocking
# unboundedly, poll is_ready() against this deadline and let the caller
# re-dispatch. 0 disables (local devices don't need it). The default
# must cover a warm execution + RTT, NOT a cold compile — compiles
# belong to boot warmup, and a re-dispatched program that genuinely
# still needs compiling just spends a second deadline on it.
FETCH_TIMEOUT_S = float(os.environ.get("CORTEX_FETCH_TIMEOUT_S", "45"))

log = logging.getLogger("cortex.shard")


class DeviceFetchTimeout(RuntimeError):
    """A device fetch exceeded FETCH_TIMEOUT_S; the dispatch is
    presumed lost and should be re-issued."""


def _fetch_array(x, timeout: float = None) -> np.ndarray:
    """np.asarray with a liveness deadline (see FETCH_TIMEOUT_S).

    Poll schedule: 0.2 ms steps for the first 50 ms (a warm serving
    fetch is ready in ~2 ms — overshoot must stay negligible), then
    5 ms steps to one second, then 50 ms until the deadline. The
    watchdog exists to catch minute-scale wedges, not to add latency
    to healthy fetches."""
    import time as _time
    if timeout is None:
        timeout = FETCH_TIMEOUT_S
    if timeout > 0 and hasattr(x, "is_ready") and not x.is_ready():
        start = _time.monotonic()
        deadline = start + timeout
        while not x.is_ready():
            now = _time.monotonic()
            if now > deadline:
                raise DeviceFetchTimeout(
                    f"device fetch not ready after {timeout:.0f}s")
            el = now - start
            _time.sleep(0.0002 if el < 0.05 else
                        0.005 if el < 1.0 else 0.05)
    return np.asarray(x)


def wait_ready(x, timeout: float = None) -> None:
    """Block until a device value is ready, bounded like _fetch_array
    but WITHOUT fetching — for multi-GB device arrays (corpus uploads,
    on-device generation) where np.asarray would drag the payload
    through the tunnel just to prove liveness. Falls back to
    block_until_ready when the array type has no is_ready (then it is
    unbounded — local backends, where wedges don't happen)."""
    import time as _time
    if timeout is None:
        timeout = FETCH_TIMEOUT_S
    if timeout > 0 and hasattr(x, "is_ready"):
        start = _time.monotonic()
        deadline = start + timeout
        while not x.is_ready():
            now = _time.monotonic()
            if now > deadline:
                raise DeviceFetchTimeout(
                    f"device value not ready after {timeout:.0f}s")
            el = now - start
            _time.sleep(0.0002 if el < 0.05 else
                        0.005 if el < 1.0 else 0.05)
        return
    x.block_until_ready()
# the C++ re-rank parallelizes across queries (ctypes releases the
# GIL); single-core it's a wash with numpy's BLAS path, so only prefer
# it when there are cores to use
_USE_NATIVE_RERANK = (os.cpu_count() or 1) > 1
MAX_FILTER_KINDS = 16
MAX_EXCLUDE = 64
NO_FILTER = -1
PAD_CODE = -2
# corpora below this row count search via the bf16/fp32 approx or exact
# paths even on TPU — the int8 scan's bandwidth win only matters at scale
QUANT_MIN_CAP = 4096
SEARCH_PATHS = ("auto", "exact", "approx", "quant")


def _norm_rows(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return (x / np.maximum(n, 1e-12)).astype(np.float32)


def _donated_buffer_race(e: Exception) -> bool:
    """True when an exception is the dispatch-on-donated-buffer race:
    searches capture device-array handles under the corpus lock but
    dispatch OUTSIDE it (cold XLA compiles take ~tens of seconds on a
    tunneled device), so a concurrent sync() can run a donating scatter
    (_scatter_update and friends, donate_argnums) between capture and
    enqueue — the runtime then rejects the stale handle loudly rather
    than reading the aliased buffer. Callers recapture fresh handles
    and re-dispatch; the final fallback dispatches while HOLDING the
    lock, which excludes sync() entirely, so retries are bounded."""
    m = str(e).lower()
    return "delet" in m or "donat" in m or "invalid buffer" in m


def _pad_pow2(*arrs: np.ndarray) -> tuple:
    """Pad aligned arrays to the next power-of-two length by REPEATING
    their first element: scatters stay idempotent (duplicate indices
    carry identical values), and every count shares one of ~log2(cap)
    compiled programs instead of compiling its own. Without this a
    mixed write workload produces arbitrary counts wave by wave and
    every novel count pays a cold XLA compile (~tens of seconds on a
    tunneled device) INSIDE the serving path — measured as
    multi-minute p99 search stalls in benches/mixed_workload_bench.py."""
    n = len(arrs[0])
    b = 1
    while b < n:
        b *= 2
    if b == n:
        return arrs
    return tuple(np.concatenate([a, np.repeat(a[:1], b - n, axis=0)])
                 for a in arrs)


def _bucket_rows(rows: np.ndarray) -> np.ndarray:
    """Single-array form of _pad_pow2 (dirty-row scatters)."""
    return _pad_pow2(rows)[0]


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _scatter_update(emb, live, kind_code, agent_code, rows, vecs, lv, kc, ac):
    emb = emb.at[rows].set(vecs)
    live = live.at[rows].set(lv)
    kind_code = kind_code.at[rows].set(kc)
    agent_code = agent_code.at[rows].set(ac)
    return emb, live, kind_code, agent_code


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _scatter_update_masks(live, kind_code, agent_code, rows, lv, kc, ac):
    """Mask-only scatter for quant-only residency (no device emb)."""
    return (live.at[rows].set(lv), kind_code.at[rows].set(kc),
            agent_code.at[rows].set(ac))


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3),
                   static_argnames=("pad",))
def _pad_device(emb, live, kind_code, agent_code, *, pad):
    """Device-side capacity growth: extend the resident arrays with
    dead rows IN HBM (~ms memcpy) instead of re-uploading the whole
    corpus from the host mirror. The old full-resync path shipped a
    3 GB transfer through the (possibly tunneled) device link on every
    capacity-ladder step — measured as a recurring ~150-190 s p99
    search stall in benches/mixed_workload_bench.py whenever streaming
    writes crossed a ladder boundary mid-serving."""
    z = jnp.zeros((pad, emb.shape[1]), emb.dtype)
    return (jnp.concatenate([emb, z]),
            jnp.concatenate([live, jnp.zeros((pad,), live.dtype)]),
            jnp.concatenate([kind_code,
                             jnp.full((pad,), PAD_CODE, jnp.int32)]),
            jnp.concatenate([agent_code,
                             jnp.full((pad,), PAD_CODE, jnp.int32)]))


@functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                   static_argnames=("pad",))
def _pad_masks(live, kind_code, agent_code, *, pad):
    """Mask-only growth for quant-only residency (no device emb)."""
    return (jnp.concatenate([live, jnp.zeros((pad,), live.dtype)]),
            jnp.concatenate([kind_code,
                             jnp.full((pad,), PAD_CODE, jnp.int32)]),
            jnp.concatenate([agent_code,
                             jnp.full((pad,), PAD_CODE, jnp.int32)]))


@functools.partial(jax.jit, donate_argnums=(0, 1),
                   static_argnames=("pad",))
def _pad_quant(i8, ri, *, pad):
    return (jnp.concatenate([i8, jnp.zeros((pad, i8.shape[1]),
                                           jnp.int8)]),
            jnp.concatenate([ri, jnp.zeros((pad,), jnp.float32)]))


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _scatter_quant_rows(i8, ri, rows, q, rinv):
    """Donating int8-shadow scatter: the eager non-donating .at[].set
    copied the entire [cap, d] shadow per dirty sync (~7.7 GB at
    10Mx768) and transiently doubled its HBM footprint. Donation races
    with in-flight captured snapshots are already handled by
    _donated_buffer_race, same as the emb scatter."""
    return i8.at[rows].set(q), ri.at[rows].set(rinv)


@jax.jit
def _build_bias(live, kind_code, agent_code, allowed_kinds, allowed_agent,
                exclude_rows):
    """[N] additive bias: 0 for admissible rows, <= -1e30 otherwise.

    allowed_kinds: [MAX_FILTER_KINDS] int32, first element NO_FILTER when
    unfiltered, padded with PAD_CODE. allowed_agent: scalar int32 or
    NO_FILTER. exclude_rows: [MAX_EXCLUDE] int32 padded with NO_FILTER.
    """
    bias = jnp.where(live, 0.0, NEG_INF)
    kind_on = allowed_kinds[0] != NO_FILTER
    kind_ok = jnp.any(kind_code[:, None] == allowed_kinds[None, :], axis=1)
    bias = bias + jnp.where(kind_on & ~kind_ok, NEG_INF, 0.0)
    agent_on = allowed_agent != NO_FILTER
    bias = bias + jnp.where(agent_on & (agent_code != allowed_agent),
                            NEG_INF, 0.0)
    n = live.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    excluded = jnp.any(row_ids[:, None] == exclude_rows[None, :], axis=1)
    bias = bias + jnp.where(excluded, NEG_INF, 0.0)
    return bias


@functools.partial(jax.jit, static_argnames=("k", "path", "over"))
def _fused_search(emb, live, kind_code, agent_code, ak, aa, ex, q,
                  *, k: int, path: str, over: int):
    """Bias construction + search in ONE dispatch. Every device call
    pays fixed dispatch latency (severe behind a network-tunneled TPU,
    non-zero even locally), so the mask build and the scan must not be
    separate round trips."""
    bias = _build_bias(live, kind_code, agent_code, ak, aa, ex)
    if path == "approx":
        return cosine_topk_approx(emb, q, k, bias[None, :], over=over)
    return cosine_topk_xla(emb, q, k, bias[None, :])


@functools.partial(jax.jit, static_argnames=("cand", "over"))
def _fused_search_quant(emb_i8, rinv, live, kind_code, agent_code,
                        ak, aa, ex, q, *, cand: int, over: int):
    """int8 candidate scan with in-dispatch mask build. Returns the
    top-`cand` rows by approximate (descaled int8) score; the caller
    re-ranks them exactly against the fp32 host mirror."""
    bias = _build_bias(live, kind_code, agent_code, ak, aa, ex)
    return cosine_topk_quant(emb_i8, rinv, q, cand, bias, over=over)


@functools.partial(jax.jit, static_argnames=("k", "path", "over"))
def _fused_search_hostbias(emb, bias, q, *, k: int, path: str, over: int):
    """Search with a fully host-computed [N] bias — the exact fallback
    when filter lists exceed the fixed-shape encoding limits (r1 VERDICT
    #8: silent truncation let excluded nodes back into results)."""
    if path == "approx":
        return cosine_topk_approx(emb, q, k, bias[None, :], over=over)
    return cosine_topk_xla(emb, q, k, bias[None, :])


@functools.partial(jax.jit, static_argnames=("cand", "over"))
def _fused_search_quant_hostbias(emb_i8, rinv, bias, q,
                                 *, cand: int, over: int):
    return cosine_topk_quant(emb_i8, rinv, q, cand, bias, over=over)


@functools.partial(jax.jit, static_argnames=("k", "cand", "over"))
def _fused_search_quant_exact(emb_i8, rinv, emb_f32, live, kind_code,
                              agent_code, ak, aa, ex, q,
                              *, k: int, cand: int, over: int):
    """int8 candidate scan + device exact fp32 re-rank + final top-k in
    ONE dispatch (mask build included). Replaces the r2 host re-rank
    when the fp32 corpus is device-resident — see
    ops.similarity.cosine_topk_quant_exact."""
    bias = _build_bias(live, kind_code, agent_code, ak, aa, ex)
    return cosine_topk_quant_exact(emb_i8, rinv, emb_f32, q, k, cand,
                                   bias, over=over)


@functools.partial(jax.jit, static_argnames=("k", "cand", "over"))
def _fused_search_quant_exact_hostbias(emb_i8, rinv, emb_f32, bias, q,
                                       *, k: int, cand: int, over: int):
    return cosine_topk_quant_exact(emb_i8, rinv, emb_f32, q, k, cand,
                                   bias, over=over)


#: Set at interpreter exit: background warm threads (daemon) must stop
#: issuing compiles once teardown starts — a compile RPC in flight
#: while the runtime unloads can abort the process from C++
#: ("FATAL: exception not rethrown").
_SHUTDOWN = threading.Event()
_WARM_THREADS: "weakref.WeakSet[threading.Thread]" = weakref.WeakSet()


def _drain_warm_threads() -> None:
    """atexit: stop background warms and wait out any compile already
    in flight — a compile RPC running while the runtime unloads can
    abort the process from C++ ("FATAL: exception not rethrown")."""
    _SHUTDOWN.set()
    for t in list(_WARM_THREADS):
        t.join(timeout=120.0)


atexit.register(_drain_warm_threads)


class _WarmAborted(BaseException):
    """Raised inside a background warm when interpreter shutdown
    begins; unwinds the warm loop without issuing further compiles."""


#: Programs whose compiled form is capacity-shaped and therefore goes
#: cold at every ladder crossing. DeviceCorpus._logged records each
#: (program, arg shapes, statics) combination actually dispatched, and
#: warm_growth_programs re-lowers the set at the NEXT capacity so the
#: crossing's compile storm happens at warmup time, shape-only.
_WARMABLE = {
    "search": _fused_search,
    "search_hostbias": _fused_search_hostbias,
    "search_quant": _fused_search_quant,
    "search_quant_hostbias": _fused_search_quant_hostbias,
    "search_quant_exact": _fused_search_quant_exact,
    "search_quant_exact_hostbias": _fused_search_quant_exact_hostbias,
    "scatter_update": _scatter_update,
    "scatter_update_masks": _scatter_update_masks,
    "scatter_quant_rows": _scatter_quant_rows,
}


class Interner:
    """string <-> int32 code, append-only."""

    def __init__(self):
        self._code: Dict[str, int] = {}
        self._name: List[str] = []

    def code(self, name: str) -> int:
        c = self._code.get(name)
        if c is None:
            c = len(self._name)
            self._code[name] = c
            self._name.append(name)
        return c

    def lookup(self, name: str) -> int:
        """Code for name, or PAD_CODE (matches nothing) when unseen."""
        return self._code.get(name, PAD_CODE)

    def name(self, code: int) -> str:
        return self._name[code]


class DeviceCorpus:
    """Padded [cap, d] embedding corpus with liveness + metadata codes."""

    def __init__(self, dim: int, *, search_path: str = "auto",
                 storage_dtype: str = "float32",
                 use_pallas: Optional[bool] = None):
        self.dim = dim
        # device-side embedding dtype: bf16 halves HBM residency, host->
        # device transfer, and scan bandwidth (MXU accumulates fp32
        # either way); host mirror stays fp32 for exact snapshots
        self._storage_dtype = (jnp.bfloat16 if storage_dtype == "bfloat16"
                               else jnp.float32)
        self._cap = 0
        self._emb_h = np.zeros((0, dim), np.float32)
        self._live_h = np.zeros((0,), bool)
        self._kind_h = np.full((0,), PAD_CODE, np.int32)
        self._agent_h = np.full((0,), PAD_CODE, np.int32)
        self._row_of: Dict[str, int] = {}
        self._id_of: List[Optional[str]] = []
        self._free: List[int] = []
        self._dirty: set[int] = set()
        self._recycled: set[int] = set()   # freed rows, not yet reassigned
        self._generation = 0               # bumps when a row is reassigned
        self._full_resync = True
        self._grow_pad = 0                 # rows to pad ON DEVICE at sync
        #: (name, arg-shape spec, statics) -> cap at record time; the
        #: replay set for pre-compiling the next ladder step's programs
        self._dispatch_log: Dict[tuple, int] = {}
        self._warm_pending = False         # one background warm at a time
        self._last_warm_key = None         # (target cap, log size) memo
        #: host-mirror pre-growth: (base_cap, new_cap, emb, live, kind,
        #: agent) built in the background so _grow swaps instead of
        #: copying gigabytes under the corpus lock
        self._pregrown: Optional[tuple] = None
        self._pregrow_touched: Optional[set] = None  # rows mutated mid-build
        self._pregrow_pending = False
        self._dev: Optional[Tuple[jnp.ndarray, ...]] = None
        self._dev_q: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
        self._quant_mu = np.zeros(dim, np.float32)   # int8 centering shift
        self._bf16_mu: Optional[np.ndarray] = None   # bf16 centering shift
        self.kinds = Interner()
        self.agents = Interner()
        self._lock = threading.RLock()
        #: recent successful serving-fetch durations (seconds) — the
        #: adaptive first-fetch watchdog derives its deadline from
        #: these (VERDICT r4 #7: both 1M and 10M batch-1 runs recorded
        #: one 35-40 s outlier in 50 — a response the tunnel delivered
        #: just UNDER the fixed 45 s watchdog, so no re-dispatch ever
        #: fired; racing a re-dispatch after ~10x the recent p95 turns
        #: that tail into a bounded blip)
        from collections import deque
        self._fetch_times: "deque" = deque(maxlen=128)
        self.fetch_redispatches = 0   # observability (/stats, soaks)
        #: program shapes this corpus has served at least once — the
        #: adaptive first-fetch deadline only applies to these (a cold
        #: shape's first fetch legitimately waits out an XLA compile)
        self._seen_progs: set = set()
        # legacy kwarg (r1's pallas kernel is gone): use_pallas=False
        # used to force the exact XLA path — honor that meaning
        if use_pallas is False and search_path == "auto":
            search_path = "exact"
        if search_path not in SEARCH_PATHS:
            raise IndexError_(f"search_path must be one of {SEARCH_PATHS}, "
                              f"got {search_path!r}")
        self._search_path = search_path
        try:
            self._on_tpu = jax.devices()[0].platform == "tpu"
        except Exception:  # noqa: BLE001
            self._on_tpu = False
        # HBM budget for corpus residency (GB). Above ~4M x 768 the fp32
        # corpus no longer fits beside the int8 shadow on a 16GB chip;
        # sync() then keeps ONLY the int8 shadow + filter masks device-
        # resident (quant-only residency) and search re-ranks on the
        # host mirror. The reference's vector ceiling is 1M
        # (ARCHITECTURE.md:314); this is what takes us to 10M+.
        self._hbm_budget = float(os.environ.get(
            "CORTEX_HBM_BUDGET_GB", "12")) * (1 << 30)
        self._emb_resident = True

    # ------------------------------------------------------------- mutation
    def __len__(self) -> int:
        with self._lock:
            return len(self._row_of)

    def __contains__(self, node_id: str) -> bool:
        return node_id in self._row_of

    #: above this row count the capacity ladder grows 1.25x per step
    #: instead of doubling: a 10M-row corpus under doubling would land
    #: at 16.7M rows of padding (13GB int8 alone), blowing the HBM
    #: budget for rows that don't exist. Each distinct capacity costs
    #: one XLA compile either way; 1.25x adds a handful of steps.
    GENTLE_GROWTH_ROWS = 4 << 20

    def _row_alignment(self) -> int:
        """Row-count alignment for capacity growth: 8 keeps blocks
        sublane-aligned. ShardedCorpus overrides with the mesh size —
        1.25x gentle steps strip the power-of-two factor and a cap not
        divisible by n_dev breaks the even NamedSharding."""
        return 8

    def _next_cap(self, need: int) -> int:
        """The capacity-ladder step that covers `need` rows: doubling
        up to GENTLE_GROWTH_ROWS, then 1.25x aligned steps."""
        align = max(8, self._row_alignment())
        new_cap = max(MIN_CAP, self._cap)
        while new_cap < need:
            if new_cap >= self.GENTLE_GROWTH_ROWS:
                new_cap = ((new_cap + new_cap // 4) + align - 1) \
                    // align * align
            else:
                new_cap *= 2
        return new_cap

    def _grow(self, need: int) -> None:
        new_cap = self._next_cap(need)
        if new_cap == self._cap:
            return
        pad = new_cap - self._cap
        pg, touched = self._pregrown, self._pregrow_touched
        self._pregrown = self._pregrow_touched = None
        if pg is not None and pg[0] == self._cap and pg[1] == new_cap:
            # background-built mirrors: swap + catch-up copy of rows
            # mutated during the build, instead of copying the whole
            # multi-GB mirror here under the corpus lock (measured
            # 24-37 s at 1M x 384 on this contended 1-vCPU host — a
            # total serving outage; the catch-up is a few thousand
            # rows)
            _, _, emb2, live2, kind2, agent2 = pg
            rows = np.fromiter(touched or (), np.int32)
            if len(rows):
                emb2[rows] = self._emb_h[rows]
                live2[rows] = self._live_h[rows]
                kind2[rows] = self._kind_h[rows]
                agent2[rows] = self._agent_h[rows]
            self._emb_h, self._live_h = emb2, live2
            self._kind_h, self._agent_h = kind2, agent2
        else:
            with tracing.span("shard.grow_host_copy"):
                self._emb_h = np.vstack(
                    [self._emb_h, np.zeros((pad, self.dim), np.float32)])
                self._live_h = np.concatenate(
                    [self._live_h, np.zeros(pad, bool)])
                self._kind_h = np.concatenate(
                    [self._kind_h, np.full(pad, PAD_CODE, np.int32)])
                self._agent_h = np.concatenate(
                    [self._agent_h, np.full(pad, PAD_CODE, np.int32)])
        self._free.extend(range(self._cap, new_cap))
        self._id_of.extend([None] * pad)
        self._cap = new_cap
        if self._can_grow_on_device():
            # extend the resident arrays in HBM at next sync instead
            # of re-uploading the corpus (see _pad_device)
            self._grow_pad += pad
        else:
            self._full_resync = True

    def _can_grow_on_device(self) -> bool:
        """Growth can pad the device arrays in place when this is the
        plain single-device corpus with resident arrays whose residency
        decision doesn't flip at the new capacity. Subclasses (sharded,
        IVF) keep the full-resync path: their layouts re-place on
        growth (GSPMD sharding / cluster re-pack)."""
        if type(self) is not DeviceCorpus or self._dev is None:
            return False
        if self._dev[0] is not None:
            return self._emb_fits()           # at the NEW self._cap
        # quant-only residency: the int8 shadow alone must still fit
        return self._cap * self.dim <= self._hbm_budget

    def _logged(self, name: str, *args, **statics):
        """Dispatch a capacity-shaped jitted program, recording its
        (arg shapes, statics) so warm_growth_programs can re-lower the
        same program at the next ladder capacity. Recording costs one
        small tuple build per dispatch; the dict is bounded by the
        distinct program set XLA already caches."""
        spec = tuple((tuple(a.shape), a.dtype) for a in args)
        key = (name, spec, tuple(sorted(statics.items())))
        if key not in self._dispatch_log:
            self._dispatch_log[key] = self._cap
            # A SEARCH program family just went live (first dispatch
            # at a new capacity, or the quant path enabling at
            # QUANT_MIN_CAP): schedule its next-cap twin. DELAYED and
            # PACED — an immediate burst right after a crossing was
            # measured as a 29 s serving outage at 1M (every compile
            # RPC head-of-line-blocks serving through a tunneled
            # device), while the next crossing needs occupancy to
            # double, so a short quiet-period delay always wins the
            # race at production scale. Scatter keys don't trigger:
            # bulk-load phases cross many ladder steps with no serving
            # traffic, and warm compiles were measured to slow the 1M
            # index seed 229 s -> 569 s when they fired from writes.
            if name.startswith("search"):
                self._warm_next_step_async()
        if name.startswith("search"):
            # host-mirror pre-growth has its own occupancy gate and
            # must fire even when no new program appears
            self._maybe_pregrow_host()
        return _WARMABLE[name](*args, **statics)

    def warm_growth_programs(self, *, pace_s: float = 0.0) -> bool:
        """AOT-compile the NEXT capacity-ladder step's device programs
        — the growth pads AND every capacity-shaped program observed so
        far (search paths, scatter buckets), re-lowered at the next cap
        from ShapeDtypeStructs: no HBM allocated, results land in the
        jit dispatch cache. A ladder crossing otherwise invalidates
        every shape-specialized program at once and the compile storm
        lands mid-serving (~20-40 s PER program through a tunneled
        device, head-of-line-blocking the shared transport; measured as
        an 80 s p99 in the 1M mixed-workload bench). Compiles run
        OUTSIDE the corpus lock. Returns False when growth would take
        the full-resync path (sharded/IVF layouts, non-resident
        corpus)."""
        with self._lock:
            if not self._can_grow_on_device():
                return False
            cap = self._cap
            new_cap = self._next_cap(cap + 1)
            pad = new_cap - cap
            warm_key = (new_cap, len(self._dispatch_log))
            if warm_key == self._last_warm_key:
                return True               # this target is already warm
            self._last_warm_key = warm_key
            emb, live, kc, ac = self._dev
            sds = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
            pads = []
            if emb is not None:
                pads.append((_pad_device,
                             (sds(emb), sds(live), sds(kc), sds(ac))))
            else:
                pads.append((_pad_masks, (sds(live), sds(kc), sds(ac))))
            if self._dev_q is not None:
                pads.append((_pad_quant, (sds(self._dev_q[0]),
                                          sds(self._dev_q[1]))))
            has_quant = self._dev_q is not None
            replay = list(self._dispatch_log.items())

        def paced():
            """Gap between compiles: through a tunneled device every
            compile RPC head-of-line-blocks serving dispatches, so the
            background warm spreads them out instead of bursting
            (a burst was measured as a 29 s serving outage at 1M).
            Raises at interpreter shutdown so no further compile is
            issued while the runtime tears down."""
            if _SHUTDOWN.is_set():
                raise _WarmAborted
            if pace_s > 0:
                _SHUTDOWN.wait(pace_s)

        for fn, args in pads:
            try:
                fn.lower(*args, pad=pad).compile()
                paced()
            except Exception:   # noqa: BLE001 — warm is best-effort
                log.debug("pad warm failed", exc_info=True)
        seen = set()
        for (name, spec, statics), rec_cap in replay:
            if rec_cap == new_cap:
                continue                   # already compiled at target
            shapes = tuple(tuple(new_cap if d == rec_cap else d
                                 for d in shape) for shape, _ in spec)
            if (name, shapes, statics) in seen:
                continue   # an older-cap entry mapping to the same target
            seen.add((name, shapes, statics))
            args = [jax.ShapeDtypeStruct(shape, dtype)
                    for shape, (_, dtype) in zip(shapes, spec)]
            try:
                _WARMABLE[name].lower(*args, **dict(statics)).compile()
                paced()
            except Exception:   # noqa: BLE001 — warm is best-effort
                log.debug("growth warm failed for %s", name,
                          exc_info=True)
        # synthesize the scatter buckets the boot warmup doesn't
        # execute (2048..MAX_SCATTER_ROWS) at both capacities: a write
        # backlog can land any bucket up to the bound, and a cold one
        # compiles under the corpus lock on the serving path
        S = jax.ShapeDtypeStruct
        d = self.dim
        for cap_t in (cap, new_cap):
            b = 2048
            limit = min(MAX_SCATTER_ROWS, max(4096, cap_t // 8))
            while b <= limit:
                rows = S((b,), jnp.int32)
                lv, kc_r, ac_r = (S((b,), jnp.bool_),
                                  S((b,), jnp.int32), S((b,), jnp.int32))
                masks = (S((cap_t,), jnp.bool_), S((cap_t,), jnp.int32),
                         S((cap_t,), jnp.int32))
                try:
                    if emb is not None:
                        _scatter_update.lower(
                            S((cap_t, d), emb.dtype), *masks, rows,
                            S((b, d), emb.dtype), lv, kc_r,
                            ac_r).compile()
                    else:
                        _scatter_update_masks.lower(
                            *masks, rows, lv, kc_r, ac_r).compile()
                    if has_quant:
                        _scatter_quant_rows.lower(
                            S((cap_t, d), jnp.int8), S((cap_t,),
                                                       jnp.float32),
                            rows, S((b, d), jnp.int8),
                            S((b,), jnp.float32)).compile()
                    paced()
                except Exception:   # noqa: BLE001 — best-effort
                    log.debug("scatter-bucket warm failed at %d/%d",
                              b, cap_t, exc_info=True)
                b *= 2
        return True

    def _maybe_pregrow_host(self) -> None:
        """Kick the background host-mirror pre-growth when occupancy
        reaches 85 % of capacity. Triggered from search dispatches
        (serving phases); bulk loads take the synchronous copy in
        _grow, where nothing serves concurrently."""
        if self._pregrow_pending or _SHUTDOWN.is_set():
            return                        # cheap unlocked fast path
        with self._lock:
            # test-and-set UNDER the lock: searches dispatch lock-free,
            # so two concurrent callers could otherwise both observe
            # pending == False and start two builder threads — the
            # second builder's fresh touched-set would orphan the
            # first's mutation log, and the swap in _grow would then
            # miss rows mutated during the first build (silent host-
            # mirror corruption of exactly the freshest writes)
            if self._pregrow_pending:
                return
            cap = self._cap
            if cap == 0 or (cap - len(self._free)) < (cap * 85) // 100:
                return
            pg = self._pregrown
            if pg is not None and pg[0] == cap:
                return                    # already built for this cap
            self._pregrow_pending = True
        t = threading.Thread(target=self._pregrow_host, daemon=True,
                             name="cortex-host-pregrow")
        _WARM_THREADS.add(t)
        t.start()

    def _pregrow_host(self) -> None:
        """Build the next capacity's host mirrors in the background:
        allocate at the next ladder cap and copy the current mirrors
        across in small chunks, holding the corpus lock only per chunk
        (~12 MB) so searches and writers interleave. Rows mutated
        during the build are tracked (_pregrow_touched) and re-copied
        by _grow at swap time. Memory-bandwidth cost is the same as
        the synchronous copy; the point is WHERE it's paid — off the
        serving path, before the crossing."""
        published = False
        touched: Optional[set] = None
        try:
            with self._lock:
                cap = self._cap
                new_cap = self._next_cap(cap + 1)
                if new_cap == cap:
                    return
                # the builder OWNS this exact set object: compact()
                # (which reshuffles every row at an UNCHANGED capacity
                # in the >=85%-occupancy regime, so a cap check alone
                # cannot see it) replaces it with None — identity is
                # the abandon signal
                touched = set()
                self._pregrow_touched = touched
            emb2 = np.zeros((new_cap, self.dim), np.float32)
            live2 = np.zeros(new_cap, bool)
            kind2 = np.full(new_cap, PAD_CODE, np.int32)
            agent2 = np.full(new_cap, PAD_CODE, np.int32)
            chunk = 8192
            for s in range(0, cap, chunk):
                if _SHUTDOWN.is_set():
                    return
                with self._lock:
                    if (self._cap != cap
                            or self._pregrow_touched is not touched):
                        return            # grew/compacted mid-build
                    e = min(s + chunk, cap)
                    emb2[s:e] = self._emb_h[s:e]
                    live2[s:e] = self._live_h[s:e]
                    kind2[s:e] = self._kind_h[s:e]
                    agent2[s:e] = self._agent_h[s:e]
            with self._lock:
                if (self._cap != cap
                        or self._pregrow_touched is not touched):
                    return
                self._pregrown = (cap, new_cap, emb2, live2, kind2,
                                  agent2)
                published = True
                log.info("host mirrors pre-grown %d -> %d rows "
                         "(background)", cap, new_cap)
        except Exception:   # noqa: BLE001 — best-effort
            log.debug("host pre-grow failed", exc_info=True)
        finally:
            with self._lock:
                if (not published and touched is not None
                        and self._pregrow_touched is touched):
                    self._pregrow_touched = None   # nothing to catch up
                self._pregrow_pending = False

    def _warm_next_step_async(self) -> None:
        """After a growth lands, pre-compile the FOLLOWING step's
        programs off the serving path so the system stays one ladder
        step ahead (boot warmup covers the first step)."""
        if self._warm_pending:
            return
        self._warm_pending = True

        pace = float(os.environ.get("CORTEX_GROWTH_WARM_PACE_S", "0.75"))
        delay = float(os.environ.get("CORTEX_GROWTH_WARM_DELAY_S", "45"))

        def run():
            try:
                # quiet-period delay: let the crossing's own traffic
                # burst settle before spending the device link on
                # compiles (interruptible at shutdown)
                if _SHUTDOWN.wait(delay):
                    return
                while not _SHUTDOWN.is_set():
                    before = len(self._dispatch_log)
                    self.warm_growth_programs(pace_s=pace)
                    if len(self._dispatch_log) == before:
                        break    # log stable: every combo has its twin
            except _WarmAborted:
                pass             # interpreter shutdown mid-warm
            except Exception:   # noqa: BLE001 — warm is best-effort
                log.debug("background growth warm failed",
                          exc_info=True)
            finally:
                self._warm_pending = False

        t = threading.Thread(target=run, daemon=True,
                             name="cortex-growth-warm")
        _WARM_THREADS.add(t)
        t.start()

    def upsert(self, node_id: str, vector: np.ndarray, kind: str,
               agent: str) -> None:
        self.upsert_batch([node_id], np.asarray(vector, np.float32)[None, :],
                          [kind], [agent])

    def upsert_batch(self, ids: Sequence[str], vectors: np.ndarray,
                     kinds: Sequence[str], agents: Sequence[str]) -> None:
        if vectors.ndim != 2 or vectors.shape[1] != self.dim:
            raise IndexError_(
                f"vector dim {vectors.shape} != corpus dim {self.dim}")
        vectors = _norm_rows(vectors)
        with self._lock:
            new_count = sum(1 for i in ids if i not in self._row_of)
            if new_count > len(self._free):
                self._grow(self._cap - len(self._free) + new_count)
            for j, nid in enumerate(ids):
                row = self._row_of.get(nid)
                if row is None:
                    if not self._free:
                        self._grow(self._cap + 1)
                    row = self._free.pop()
                    if row in self._recycled:
                        # a previously-removed row gets a NEW id: any
                        # in-flight search dispatched against the old
                        # mapping must re-map (see _finish_topk)
                        self._recycled.discard(row)
                        self._generation += 1
                    self._row_of[nid] = row
                    self._id_of[row] = nid
                self._emb_h[row] = vectors[j]
                self._live_h[row] = True
                self._kind_h[row] = self.kinds.code(kinds[j])
                self._agent_h[row] = self.agents.code(agents[j])
                self._dirty.add(row)
                if self._pregrow_touched is not None:
                    self._pregrow_touched.add(row)

    def remove(self, node_id: str) -> bool:
        with self._lock:
            row = self._row_of.pop(node_id, None)
            if row is None:
                return False
            self._live_h[row] = False
            self._emb_h[row] = 0.0
            self._kind_h[row] = PAD_CODE
            self._agent_h[row] = PAD_CODE
            self._id_of[row] = None
            self._free.append(row)
            self._recycled.add(row)   # reassignment invalidates in-flight maps
            self._dirty.add(row)
            if self._pregrow_touched is not None:
                self._pregrow_touched.add(row)
            return True

    def compact(self) -> None:
        """Repack live rows contiguously (reference rebuild() analog)."""
        with self._lock:
            self._generation += 1      # every row may move
            self._recycled.clear()
            self._pregrown = self._pregrow_touched = None  # stale layout
            ids = [i for i in self._id_of if i is not None]
            rows = [self._row_of[i] for i in ids]
            emb = self._emb_h[rows].copy()
            kinds = self._kind_h[rows].copy()
            agents = self._agent_h[rows].copy()
            self._cap = 0
            self._emb_h = np.zeros((0, self.dim), np.float32)
            self._live_h = np.zeros((0,), bool)
            self._kind_h = np.full((0,), PAD_CODE, np.int32)
            self._agent_h = np.full((0,), PAD_CODE, np.int32)
            self._row_of.clear()
            self._id_of = []
            self._free = []
            self._grow(max(len(ids), 1))
            for j, nid in enumerate(ids):
                row = self._free.pop()
                self._row_of[nid] = row
                self._id_of[row] = nid
                self._emb_h[row] = emb[j]
                self._live_h[row] = True
                self._kind_h[row] = kinds[j]
                self._agent_h[row] = agents[j]
            self._full_resync = True
            self._dirty.clear()

    # ---------------------------------------------------------------- device
    def _emb_for_device(self, rows=None,
                        mu: Optional[np.ndarray] = None) -> np.ndarray:
        """mu: precomputed live-row mean (a full upload with bf16 AND
        the int8 shadow otherwise computes the identical O(cap*d) mean
        twice — see _upload_full)."""
        src = self._emb_h if rows is None else self._emb_h[rows]
        if self._storage_dtype == jnp.bfloat16:
            # CENTERED bf16 (cast on host so the wire/HBM cost is
            # halved too): rounding error then scales with the residual
            # ||x - mu||, not ||x|| — on anisotropic real-encoder
            # corpora (all rows share a dominant component) this is the
            # difference between ~0.71 and ~1.0 recall@10. Ranking is
            # invariant per query; the q.mu term is added back to the
            # returned scores on the host (_finish_topk). Partial row
            # updates reuse the last full-sync mu (any fixed shift is
            # ranking-correct).
            if rows is None:
                live = self._live_h
                self._bf16_mu = (mu if mu is not None else (
                    self._emb_h[live].mean(axis=0).astype(np.float32)
                    if live.any() else None))
            if self._bf16_mu is not None:
                src = src - self._bf16_mu[None, :]
            return src.astype(jax.dtypes.bfloat16)
        return src

    def _quant_enabled(self) -> bool:
        """Whether the int8 shadow corpus is maintained on device."""
        return (self._search_path == "quant"
                or (self._search_path == "auto" and self._on_tpu))

    def _emb_fits(self) -> bool:
        """Whether the full-precision corpus fits on device beside the
        int8 shadow under the HBM budget. False -> quant-only residency
        (int8 + masks on device; exact re-rank on the host mirror)."""
        if not self._quant_enabled():
            return True           # nothing else to keep; let it OOM loudly
        esize = 2 if self._storage_dtype == jnp.bfloat16 else 4
        emb_bytes = self._cap * self.dim * esize
        quant_bytes = self._cap * self.dim
        return emb_bytes + quant_bytes <= self._hbm_budget

    def _sync_quant(self, rows: Optional[np.ndarray],
                    mu: Optional[np.ndarray] = None) -> None:
        """Refresh the int8 shadow (values + per-row dequant factors)
        from the fp32 host mirror. rows=None -> full re-upload; mu:
        precomputed live mean (see _emb_for_device).

        Quantization is CENTERED on the live-row mean (ranking-
        invariant — see ops.similarity.quantize_rows_centered): this is
        what keeps the int8 scan's candidate recall at 1.0 on
        anisotropic real-encoder corpora. Incremental row updates
        reuse the μ of the last full sync (any fixed shift is correct;
        a stale μ only costs a sliver of quantization resolution)."""
        if rows is None:
            if mu is None:
                live = self._live_h
                mu = (self._emb_h[live].mean(axis=0).astype(np.float32)
                      if live.any() else np.zeros(self.dim, np.float32))
            q, rinv, self._quant_mu = quantize_rows_centered(
                self._emb_h, mu)
            self._dev_q = (jnp.asarray(q), jnp.asarray(rinv))
        else:
            q, rinv, _ = quantize_rows_centered(
                self._emb_h[rows], self._quant_mu)
            i8, ri = self._dev_q
            self._dev_q = self._logged(
                "scatter_quant_rows",
                i8, ri, jnp.asarray(rows), jnp.asarray(q),
                jnp.asarray(rinv))

    def _upload_full(self, quant: bool) -> None:
        self._emb_resident = self._emb_fits()
        # ONE live-mean pass: bf16 centering and int8 centering use the
        # identical mean; computing it in both legs doubled the O(cap*d)
        # host traffic per full resync
        mu_live = None
        if quant or (self._emb_resident
                     and self._storage_dtype == jnp.bfloat16):
            live = self._live_h
            mu_live = (self._emb_h[live].mean(axis=0).astype(np.float32)
                       if live.any() else None)
        emb = (jnp.asarray(self._emb_for_device(mu=mu_live))
               if self._emb_resident else None)
        if not self._emb_resident:
            log.info("corpus %d x %d exceeds the HBM budget with the "
                     "int8 shadow: quant-only residency (host exact "
                     "re-rank)", self._cap, self.dim)
        self._dev = (emb, jnp.asarray(self._live_h),
                     jnp.asarray(self._kind_h), jnp.asarray(self._agent_h))
        self._grow_pad = 0                    # arrays now at full cap
        if quant:
            self._sync_quant(None, mu=mu_live)

    def sync(self) -> None:
        """Push host diffs to device. Cheap when clean."""
        with self._lock:
            if self._cap == 0:
                return
            quant = self._quant_enabled()
            if (self._dev is None or self._full_resync
                    or (quant and self._dev_q is None)):
                with tracing.span("shard.upload_full"):
                    self._upload_full(quant)
                self._full_resync = False
                self._dirty.clear()
                return
            if self._grow_pad:
                # capacity-ladder growth: pad the RESIDENT arrays in
                # HBM (~ms) — the data is already on device; only the
                # new (dead) rows change, and those are in self._dirty
                # for the scatter below
                pad = self._grow_pad
                emb, live, kc, ac = self._dev
                with tracing.span("shard.grow_pad"):
                    if emb is not None:
                        self._dev = _pad_device(emb, live, kc, ac,
                                                pad=pad)
                    else:
                        self._dev = (None, *_pad_masks(live, kc, ac,
                                                       pad=pad))
                    if quant and self._dev_q is not None:
                        self._dev_q = _pad_quant(*self._dev_q, pad=pad)
                self._grow_pad = 0
                # the next step's pre-compile fires from the first
                # post-growth SEARCH (_logged), not here: growth during
                # a bulk write phase must not spend the link on warms
            if not self._dirty:
                return
            if len(self._dirty) > max(4096, self._cap // 8):
                with tracing.span("shard.upload_full"):
                    self._upload_full(quant)
            else:
                all_rows = np.fromiter(self._dirty, np.int32)
                # bound the scatter bucket at MAX_SCATTER_ROWS: the
                # program set stays finite (log2 buckets up to the
                # bound) so warm_growth_programs can pre-compile EVERY
                # scatter program at the next capacity — an unseen
                # larger bucket would compile mid-serving under the
                # corpus lock (a measured ~29 s serving outage at 1M
                # when a 32k-row backlog scattered through a cold
                # program on a tunneled device)
                for s in range(0, len(all_rows), MAX_SCATTER_ROWS):
                    rows = _bucket_rows(all_rows[s:s + MAX_SCATTER_ROWS])
                    with tracing.span(f"shard.scatter[{len(rows)}]"):
                        if self._dev[0] is not None:
                            self._dev = self._logged(
                                "scatter_update",
                                *self._dev, jnp.asarray(rows),
                                jnp.asarray(self._emb_for_device(rows)),
                                jnp.asarray(self._live_h[rows]),
                                jnp.asarray(self._kind_h[rows]),
                                jnp.asarray(self._agent_h[rows]))
                        else:
                            self._dev = (None, *self._logged(
                                "scatter_update_masks",
                                *self._dev[1:], jnp.asarray(rows),
                                jnp.asarray(self._live_h[rows]),
                                jnp.asarray(self._kind_h[rows]),
                                jnp.asarray(self._agent_h[rows])))
                        if quant:
                            self._sync_quant(rows)
            self._dirty.clear()

    def _host_bias(self, kinds, agent, exclude_ids) -> np.ndarray:
        """Exact [cap] additive bias computed on the host mirrors — the
        overflow path when filter lists don't fit the fixed-shape device
        encoding. Never truncates."""
        bias = np.where(self._live_h, 0.0, NEG_INF).astype(np.float32)
        if kinds is not None:
            codes = [self.kinds.lookup(k) for k in kinds]
            ok = np.isin(self._kind_h, np.asarray(codes, np.int32))
            bias = np.where(ok, bias, NEG_INF)
        if agent is not None:
            aa = self.agents.lookup(agent)
            bias = np.where(self._agent_h == aa, bias, NEG_INF)
        if exclude_ids:
            rows = [self._row_of[i] for i in exclude_ids
                    if i in self._row_of]
            bias[rows] = NEG_INF
        return bias

    def _filter_codes(self, kinds, agent, exclude_ids):
        """Encode filters as fixed-shape arrays (one compiled graph for
        every filter combination). When a filter list exceeds the fixed
        shape (16 kinds / 64 exclusions), returns a host-computed exact
        bias as the 4th element instead of silently truncating (r1
        VERDICT #8 / ADVICE #4)."""
        if ((kinds is not None and len(kinds) > MAX_FILTER_KINDS)
                or (exclude_ids and len(exclude_ids) > MAX_EXCLUDE)):
            return None, None, None, self._host_bias(kinds, agent,
                                                     exclude_ids)
        ak = np.full(MAX_FILTER_KINDS, PAD_CODE, np.int32)
        if kinds is None:
            ak[0] = NO_FILTER
        else:
            codes = [self.kinds.lookup(k) for k in kinds]
            ak[:len(codes)] = codes
        aa = np.int32(NO_FILTER if agent is None
                      else self.agents.lookup(agent))
        ex = np.full(MAX_EXCLUDE, NO_FILTER, np.int32)
        if exclude_ids:
            rows = [self._row_of[i] for i in exclude_ids
                    if i in self._row_of]
            ex[:len(rows)] = rows
        # returned as HOST arrays: jit converts at dispatch (324 bytes),
        # and the IVF corpus reads filter presence off them without a
        # device round-trip (static kernel specialization)
        return ak, aa, ex, None

    def topk(self, queries: np.ndarray, k: int, *,
             kinds: Optional[Sequence[str]] = None,
             agent: Optional[str] = None,
             exclude_ids: Optional[Sequence[str]] = None
             ) -> Tuple[np.ndarray, List[List[Optional[str]]]]:
        """Batched exact search. Returns (scores [B,k], ids [B][k]);
        dead/padded hits have score <= -1e29 and id None."""
        return self.topk_async(queries, k, kinds=kinds, agent=agent,
                               exclude_ids=exclude_ids)()

    def _k_bucket(self, k: int) -> Tuple[int, int]:
        """(kk, k_bucket): bucket k to the next power of two — distinct
        k values would each trigger an XLA recompile of top_k, so pay
        one compile per bucket and slice down."""
        kk = min(k, self._cap)
        k_bucket = 8
        while k_bucket < kk:
            k_bucket *= 2
        return kk, min(k_bucket, self._cap)

    def _choose_path(self, k_bucket: int,
                     emb_resident: Optional[bool] = None) -> str:
        """Serving-path policy (measured, BASELINE.md): int8 scan +
        exact host re-rank at scale on TPU; bf16/fp32 approx+exact-merge
        as the all-device near-exact path; exact XLA elsewhere. The
        `exact` setting forces recall-1.0-by-construction results
        (ADVICE r1 #5)."""
        if emb_resident is None:
            emb_resident = self._emb_resident
        if not emb_resident:
            # quant-only residency: the full-precision corpus never
            # made it to the device, so the int8 scan (+ host exact
            # re-rank) is the only runnable path
            return "quant"
        if self._search_path == "exact":
            return "xla"
        if self._search_path in ("approx", "quant"):
            return self._search_path
        if self._on_tpu and self._cap >= QUANT_MIN_CAP:
            return "quant"
        return "xla"

    def _cand_count(self, k_bucket: int) -> int:
        """Candidate over-provisioning for the quant path: int8 noise
        (sigma ~3e-4) must move a true top-k row past the candidate
        boundary to escape the set. r3 raised the floor 32 -> 64 (with
        over 256 -> 512 in _dispatch_search): at batch 512 the old
        config's ~5e-4/query candidate-miss rate shows up as measured
        recall 0.9994-0.9996; 64/512 measures 1.0000 (miss class
        ~1e-4, dominated by approx_max_k bin collisions, which the
        larger reduction output thins). Cost: ~13% QPS at batch 64,
        +13% at 512 — recall headroom is worth more than either."""
        return min(self._cap, max(2 * k_bucket, k_bucket + 16, 64))

    def _dispatch_search(self, q, ak, aa, ex, k_bucket: int,
                         host_bias: Optional[np.ndarray] = None,
                         dev=None, dev_q=None):
        """Issue the fused mask+scan+top-k (one device dispatch).
        Subclasses override for other device layouts (ShardedCorpus).
        Returns (values, rows, needs_rescore). host_bias (exact [cap]
        mask) replaces the fixed-shape filter codes when filter lists
        overflow the device encoding.

        dev/dev_q: device-array snapshots captured under the corpus
        lock. Callers pass them so this call — which BLOCKS for an XLA
        compile when the (batch, k, path) program is cold (~tens of
        seconds on a tunneled device) — can run OUTSIDE the lock
        without racing a concurrent re-upload swap. The arrays are
        immutable; a raced row reassignment is caught by the
        generation check in _finish_topk."""
        dev = self._dev if dev is None else dev
        dev_q = self._dev_q if dev_q is None else dev_q
        path = self._choose_path(k_bucket,
                                 emb_resident=dev[0] is not None)
        hb = jnp.asarray(host_bias) if host_bias is not None else None
        if path == "quant":
            cand = self._cand_count(k_bucket)
            over = max(512, 2 * cand)
            if (self._storage_dtype == jnp.float32
                    and dev[0] is not None):
                # fp32 corpus is device-resident: fuse the exact
                # re-rank into the scan dispatch (r3; the host re-rank
                # below remains for bf16 and quant-only residency,
                # where no exact device copy exists)
                if hb is not None:
                    v, i = self._logged(
                        "search_quant_exact_hostbias",
                        dev_q[0], dev_q[1], dev[0],
                        hb, q, k=k_bucket, cand=cand, over=over)
                else:
                    v, i = self._logged(
                        "search_quant_exact",
                        dev_q[0], dev_q[1], dev[0],
                        dev[1], dev[2], dev[3],
                        ak, aa, ex, q, k=k_bucket, cand=cand, over=over)
                return v, i, False
            if hb is not None:
                v, i = self._logged(
                    "search_quant_hostbias",
                    dev_q[0], dev_q[1], hb, q,
                    cand=cand, over=over)
            else:
                v, i = self._logged(
                    "search_quant",
                    dev_q[0], dev_q[1], dev[1],
                    dev[2], dev[3], ak, aa, ex, q,
                    cand=cand, over=over)
            return v, i, True
        if path == "approx" and self._cap >= 4096:
            path, over = "approx", max(256, 4 * k_bucket)
        else:
            path, over = "xla", 0
        if hb is not None:
            v, i = self._logged("search_hostbias", dev[0], hb, q,
                                k=k_bucket, path=path, over=over)
        else:
            v, i = self._logged("search", dev[0], dev[1], dev[2],
                                dev[3], ak, aa, ex, q,
                                k=k_bucket, path=path, over=over)
        return v, i, False

    #: sentinel: "use the corpus's CURRENT bf16 mu" — callers on the
    #: dispatch-outside-the-lock protocol must instead pass the mu
    #: captured WITH their device snapshot (see _finish_topk)
    _MU_CURRENT = object()

    def _expand_candidates(self, i, valid, q_np, flt):
        """Hook: widen the candidate list between the device fetch and
        the exact re-rank (graph-refined IVF overrides — see
        knn_graph.py). Runs under the corpus lock. flt is the host-form
        (kinds, agent, exclude_ids) triple so expanded rows can be
        filter-checked against the host metadata mirrors; q_np feeds
        multi-hop frontier selection. Returns (i, valid) — possibly
        wider; the exact re-rank scores whatever is valid, so expansion
        can only add candidates, never corrupt scores."""
        return i, valid

    def _note_fetch(self, dt: float) -> None:
        self._fetch_times.append(dt)

    def _first_fetch_deadline(self) -> float:
        """Adaptive watchdog for the FIRST fetch of a request: ~10x
        the recent p95 successful fetch, floored at 2 s, capped at
        FETCH_TIMEOUT_S. A response the tunnel loses (or delivers
        tens of seconds late) trips this quickly and the caller
        re-dispatches — retries use the full FETCH_TIMEOUT_S so a
        genuinely slow-but-alive device still completes. Until 16
        samples exist the full deadline applies (no cold-start
        misfires)."""
        if len(self._fetch_times) < 8:
            # boot warmup's searches prime the window (6-10 fetches);
            # requiring more meant the first wave of real traffic
            # after a boot still ran on the full 45 s watchdog — a
            # 60 s serving window measured every request waiting out
            # exactly that deadline behind one wedged compile
            return FETCH_TIMEOUT_S
        s = sorted(self._fetch_times)
        p95 = s[min(len(s) - 1, int(0.95 * len(s)))]
        return min(FETCH_TIMEOUT_S, max(2.0, 10.0 * p95))

    def _finish_topk(self, v, i, k: int, kk: int, generation: int,
                     q_np: Optional[np.ndarray] = None,
                     rescore: bool = False, bf16_mu=_MU_CURRENT,
                     flt=None, refine: bool = True,
                     fetch_timeout: Optional[float] = None):
        """Fetch device results and map rows -> ids. If rows were freed
        AND reassigned while the device ran (generation changed), the
        row->id mapping is no longer the one the scores were computed
        against — retry the search under the current snapshot.

        rescore=True (quant path): the device returned an int8-scored
        CANDIDATE list; re-rank it exactly against the fp32 host mirror
        (numpy gather of B*cand rows — ~0.5 ms at serving shapes, and
        it overlaps the next batch's device scan in pipelined use).

        Raises DeviceFetchTimeout when the fetch wedges (lost tunnel
        response) — the caller re-dispatches. fetch_timeout overrides
        the watchdog deadline (the serving path passes the adaptive
        first-fetch deadline; retries pass None = full)."""
        import time as _time
        t_fetch = _time.monotonic()
        v = _fetch_array(v, timeout=fetch_timeout)
        i = _fetch_array(i, timeout=fetch_timeout)
        self._note_fetch(_time.monotonic() - t_fetch)
        with self._lock:
            if generation != self._generation:
                return None     # caller retries
            if rescore:
                valid = v > -1e29
                # a row REMOVED after dispatch is zeroed in the host
                # mirror but its old quant score still marks it valid;
                # re-ranking it against the CURRENT mirror scores it
                # q·0 = 0.0 — a ghost (id None) that outranks real
                # negative-cosine hits. Mask dead-now rows so they
                # surface as score <= -1e29 → id None → dropped,
                # honoring the documented dead-hit contract.
                valid &= self._live_h[np.where(valid, i, 0)]
                if refine:
                    # graph refinement is a SERVING-recall feature;
                    # bulk scan paths (auto-linker, dedup) pass
                    # refine=False — their 0.75+/0.92+ similarity
                    # thresholds sit far above the structural-miss
                    # band, and the expansion's extra host re-rank
                    # rows measured as a 2-4 s linker-cycle tax in the
                    # 300k IVF mixed soak (BASELINE.md)
                    i, valid = self._expand_candidates(i, valid, q_np,
                                                       flt)
                nat = (rerank_topk_native(self._emb_h, q_np, i, valid, kk)
                       if _USE_NATIVE_RERANK else None)
                if nat is not None:
                    # threaded C++ gather+dot+select (GIL released):
                    # the numpy leg is single-threaded and becomes the
                    # serving bottleneck at large batches (23.9 ms at
                    # batch 512 vs the device scan's 4 ms); the native
                    # leg splits queries across cores
                    v, i = nat
                else:
                    rows = np.where(valid, i, 0)
                    g = self._emb_h[rows.reshape(-1)].reshape(
                        rows.shape[0], rows.shape[1], self.dim)
                    # batched matvec via np.matmul (BLAS) — einsum's
                    # 'bod,bd->bo' path doesn't dispatch to BLAS
                    exact = np.matmul(g, q_np[:, :, None])[:, :, 0]
                    exact = np.where(valid, exact, NEG_INF)
                    order = np.argsort(-exact, axis=1,
                                       kind="stable")[:, :kk]
                    v = np.take_along_axis(exact, order, axis=1)
                    i = np.take_along_axis(i, order, axis=1)
            else:
                v = v[:, :kk]
                i = i[:, :kk]
                # add back the per-query q.mu the centered bf16 corpus
                # dropped, so returned scores are absolute cosines
                # (thresholds/gate checks depend on them). MUST be the
                # mu the DISPATCHED snapshot was centered with — a
                # full re-upload racing an in-flight search swaps
                # self._bf16_mu, and compensating with the new mu
                # corrupts scores by q·(mu_new − mu_old)
                mu = (self._bf16_mu if bf16_mu is self._MU_CURRENT
                      else bf16_mu)
                if mu is not None and q_np is not None:
                    comp = (q_np @ mu).astype(np.float32)
                    v = np.where(v > -1e29, v + comp[:, None], v)
                # same dead-now masking as the rescore leg: the device
                # re-rank (or exact scan) scored a snapshot where the
                # row was live; a remove() landing before the fetch
                # must surface as (<= -1e29, None), not a real score
                # with a None id
                alive = v > -1e29
                alive &= self._live_h[np.where(alive, i, 0)]
                v = np.where(alive, v, NEG_INF)
            if kk < k:
                v = np.pad(v, ((0, 0), (0, k - kk)),
                           constant_values=NEG_INF)
                i = np.pad(i, ((0, 0), (0, k - kk)))
            ids = [[self._id_of[r] if v[b_, j] > -1e29 else None
                    for j, r in enumerate(row)]
                   for b_, row in enumerate(i)]
        return v, ids

    def topk_async(self, queries: np.ndarray, k: int, *,
                   kinds: Optional[Sequence[str]] = None,
                   agent: Optional[str] = None,
                   exclude_ids: Optional[Sequence[str]] = None,
                   refine: bool = True):
        """Dispatch a search WITHOUT fetching: returns a zero-arg
        callable that blocks for the result. JAX dispatch is async, so
        callers can issue several searches back-to-back and overlap
        device execution/transfer with host work (the auto-linker's
        pipelined cycle)."""
        with self._lock:
            if len(self._row_of) == 0:
                b = queries.shape[0]
                empty = (np.full((b, k), NEG_INF, np.float32),
                         [[None] * k for _ in range(b)])
                return lambda: empty
            self.sync()
            q_np = _norm_rows(np.asarray(queries, np.float32))
            # bucket the batch dim like k: every distinct B would
            # otherwise compile its own XLA program (tens of seconds
            # each on a cold cache), and batch-coalescing callers
            # produce arbitrary B values wave by wave
            b_req = q_np.shape[0]
            b_bucket = 1
            while b_bucket < b_req:
                b_bucket *= 2
            if b_bucket != b_req:
                q_np = np.concatenate(
                    [q_np, np.zeros((b_bucket - b_req, self.dim),
                                    np.float32)])
            q = jnp.asarray(q_np)
            ak, aa, ex, hb = self._filter_codes(kinds, agent, exclude_ids)
            kk, k_bucket = self._k_bucket(k)
            gen = self._generation
            dev, dev_q = self._dev, self._dev_q
            mu = self._bf16_mu     # part of the snapshot (see finish)
            # adaptive-deadline eligibility: a program shape this
            # corpus hasn't served yet may be COMPILING during its
            # first fetch (~20-40 s on a tunneled device) — applying
            # the ~2 s adaptive deadline there would fire a spurious
            # re-dispatch against an in-flight compile (review r5 #4).
            # Key covers the compile-relevant statics: batch/k
            # buckets, capacity (growth recompiles), candidate width.
            prog_key = (b_bucket, k_bucket, self._cap,
                        getattr(self, "_cand_boost", 1))
            prog_warm = prog_key in self._seen_progs
        # dispatch OUTSIDE the lock: a cold (batch, k, path) program
        # blocks here for its XLA compile (~tens of seconds on a
        # tunneled device) — holding the lock across it would stall
        # every concurrent search/insert (observed live: the linker's
        # first at-scale cycle turned into a p50 == window-length
        # serving outage). The captured arrays are immutable; a raced
        # row reassignment is caught by the generation check at fetch
        # time, and a raced donating sync() is rejected loudly by the
        # runtime (stale handle) and re-dispatched below.
        try:
            v, i, resc = self._dispatch_search(q, ak, aa, ex, k_bucket,
                                               host_bias=hb,
                                               dev=dev, dev_q=dev_q)
        except Exception as e:            # noqa: BLE001 — filtered below
            if not _donated_buffer_race(e):
                raise
            v = i = None
            resc = False

        def attempt(final: bool = False):
            """One dispatch+fetch; None when a row-reassignment or a
            donating sync() raced. final=True (caller holds the lock,
            so no race is possible by construction): re-raise instead
            of classifying — the substring classifier would otherwise
            swallow a persistent non-race error whose message merely
            contains 'deleted'/'invalid buffer' and die on the bare
            assert instead of surfacing it."""
            with self._lock:
                self.sync()
                a_ak, a_aa, a_ex, a_hb = self._filter_codes(kinds, agent,
                                                            exclude_ids)
                # recompute k's bucket: a compact() since the first
                # dispatch may have SHRUNK capacity below the captured
                # bucket, and lax.top_k(k > N) is a hard error
                a_kk, a_kb = self._k_bucket(k)
                a_gen = self._generation
                a_dev, a_dev_q = self._dev, self._dev_q
                a_mu = self._bf16_mu
            try:
                av, ai, a_resc = self._dispatch_search(
                    q, a_ak, a_aa, a_ex, a_kb, host_bias=a_hb,
                    dev=a_dev, dev_q=a_dev_q)
            except Exception as e:        # noqa: BLE001 — filtered below
                if final or not _donated_buffer_race(e):
                    raise
                return None
            return self._finish_topk(av, ai, k, a_kk, a_gen,
                                     q_np=q_np, rescore=a_resc,
                                     bf16_mu=a_mu,
                                     flt=(kinds, agent, exclude_ids),
                                     refine=refine)

        def finish_full():
            out = None
            if v is not None:
                first_deadline = (self._first_fetch_deadline()
                                  if prog_warm else FETCH_TIMEOUT_S)
                try:
                    out = self._finish_topk(v, i, k, kk, gen,
                                            q_np=q_np, rescore=resc,
                                            bf16_mu=mu,
                                            flt=(kinds, agent,
                                                 exclude_ids),
                                            refine=refine,
                                            fetch_timeout=first_deadline)
                except DeviceFetchTimeout:
                    self.fetch_redispatches += 1
                    log.warning("device fetch exceeded the adaptive "
                                "first-fetch deadline (%.1fs); "
                                "re-dispatching", first_deadline)
                    out = None      # lost dispatch: re-issue below
            if out is not None:
                return out
            # row reassignment raced the fetch (rare) or the fetch
            # timed out (wedged tunnel dispatch): bounded retries, then
            # one final attempt holding the lock across dispatch+fetch
            # so nothing can interleave — never unbounded under
            # sustained delete/insert churn
            for _ in range(3):
                try:
                    out = attempt()
                except DeviceFetchTimeout:
                    out = None
                if out is not None:
                    return out
            with self._lock:
                # locked attempts exclude generation races, but a
                # truly wedged tunnel can still time the fetch out —
                # two more tries, then let DeviceFetchTimeout escape
                # (the HTTP layer maps it to 503 + Retry-After; a
                # naked crash here surfaced as a 500 under a wedged
                # tunnel in live verification)
                for _ in range(2):
                    try:
                        out = attempt()
                    except DeviceFetchTimeout:
                        log.warning("locked re-dispatch wedged (>%.0fs); "
                                    "retrying", FETCH_TIMEOUT_S)
                        out = None
                    if out is not None:
                        return out
                out = attempt(final=True)
                assert out is not None
                return out

        def finish():
            vv, ids = finish_full()
            self._seen_progs.add(prog_key)   # warm from now on
            return vv[:b_req], ids[:b_req]   # drop batch-bucket padding
        return finish

    def topk_stream(self, queries: np.ndarray, k: int, *,
                    batch: int = 512,
                    kinds: Optional[Sequence[str]] = None,
                    agent: Optional[str] = None,
                    exclude_ids: Optional[Sequence[str]] = None,
                    refine: bool = True):
        """Bulk search over a query STREAM with one result drain.

        Dispatches the whole [NQ, d] stream chunk-by-chunk (device
        execution is in-order, so chunks pipeline), concatenates every
        chunk's score/row buffers ON DEVICE, and fetches once at the
        end. Per-chunk draining — even fully pipelined dispatch — pays
        one host<->device round trip per chunk; through a tunneled TPU
        that RTT is ~100x the scan itself, so a 1k-query stream spends
        ~94% of its wall clock in transport (BASELINE config #2, r2:
        497 q/s e2e vs a >35k QPS engine). One drain makes the stream
        cost dispatch + max(scan) + ONE fetch. Intended for bulk jobs
        (offline re-ranking, recall studies, batch ingest scoring);
        interactive serving keeps topk_async's per-wave latency.

        Returns (scores [NQ, k] np.float32, ids [NQ][k] with None
        padding), exact-re-ranked like every serving search.
        """
        q_all = np.asarray(queries, np.float32)
        if q_all.ndim != 2:
            raise ValueError("topk_stream expects [NQ, d]")
        nq = q_all.shape[0]
        if nq == 0:
            return np.zeros((0, k), np.float32), []
        with self._lock:
            if len(self._row_of) == 0:
                return (np.full((nq, k), NEG_INF, np.float32),
                        [[None] * k for _ in range(nq)])
        q_all = _norm_rows(q_all)
        # one fixed chunk bucket -> one compiled program for the whole
        # stream (the tail chunk is padded up, padding dropped at the
        # end); a sub-bucket stream shrinks to its own power of two
        b_bucket = 1
        while b_bucket < min(batch, nq):
            b_bucket *= 2
        n_chunks = (nq + b_bucket - 1) // b_bucket
        pad = n_chunks * b_bucket - nq
        q_np = (np.concatenate([q_all, np.zeros((pad, self.dim),
                                                np.float32)])
                if pad else q_all)

        def attempt(final: bool = False):
            with self._lock:
                self.sync()
                ak, aa, ex, hb = self._filter_codes(kinds, agent,
                                                    exclude_ids)
                kk, k_bucket = self._k_bucket(k)
                gen = self._generation
                dev, dev_q = self._dev, self._dev_q
                mu = self._bf16_mu   # snapshot's centering shift
            # dispatch outside the lock (cold-compile head-of-line
            # blocking — see topk_async)
            vs, rs, resc = [], [], False
            try:
                for c in range(n_chunks):
                    qc = jnp.asarray(
                        q_np[c * b_bucket:(c + 1) * b_bucket])
                    v, i, resc = self._dispatch_search(
                        qc, ak, aa, ex, k_bucket, host_bias=hb,
                        dev=dev, dev_q=dev_q)
                    vs.append(v)
                    rs.append(i)
            except Exception as e:        # noqa: BLE001 — filtered below
                if final or not _donated_buffer_race(e):
                    raise                 # see topk_async attempt()
                return None               # raced a donating sync(): retry
            # device-side concat: still async, nothing fetched yet
            v_all = jnp.concatenate(vs, axis=0)
            i_all = jnp.concatenate(rs, axis=0)
            return self._finish_topk(v_all, i_all, k, kk, gen,
                                     q_np=q_np, rescore=resc,
                                     bf16_mu=mu,
                                     flt=(kinds, agent, exclude_ids),
                                     refine=refine)

        out = None
        for _ in range(3):
            try:
                out = attempt()
            except DeviceFetchTimeout:
                log.warning("stream drain wedged (>%.0fs); re-dispatching",
                            FETCH_TIMEOUT_S)
                out = None
            if out is not None:
                break
        if out is None:
            with self._lock:        # RLock held across dispatch AND fetch
                for _ in range(2):
                    try:
                        out = attempt()
                    except DeviceFetchTimeout:
                        log.warning("locked stream re-dispatch wedged "
                                    "(>%.0fs); retrying", FETCH_TIMEOUT_S)
                        out = None
                    if out is not None:
                        break
                if out is None:
                    out = attempt(final=True)  # a wedge raises loudly
                assert out is not None
        vv, ids = out
        return vv[:nq], ids[:nq]

    # ------------------------------------------------------------- snapshot
    def rows_state(self, ids) -> Dict[str, np.ndarray]:
        """Host-mirror copies for a SUBSET of ids — the incremental-
        checkpoint capture. Cost tracks len(ids), not corpus size (a
        full state() copy is ~2 s at 1M x 768 and its 3 GB npz write
        pegs a core for ~40 s; a live checkpoint after a few hundred
        writes needs megabytes, not the corpus). ids absent or dead
        come back under "removed" (tombstones for the delta log)."""
        with self._lock:
            present, rows, missing = [], [], []
            for i in ids:
                r = self._row_of.get(i)
                if r is None:
                    missing.append(i)
                else:
                    present.append(i)
                    rows.append(r)
            return {
                "ids": np.array(present, dtype=object),
                "vectors": (self._emb_h[rows].copy() if rows
                            else np.zeros((0, self.dim), np.float32)),
                "kinds": np.array([self.kinds.name(self._kind_h[r])
                                   for r in rows], dtype=object),
                "agents": np.array([self.agents.name(self._agent_h[r])
                                    for r in rows], dtype=object),
                "removed": np.array(missing, dtype=object),
            }

    def state(self) -> Dict[str, np.ndarray]:
        with self._lock:
            ids = [i for i in self._id_of if i is not None]
            rows = [self._row_of[i] for i in ids]
            return {
                "ids": np.array(ids, dtype=object),
                "vectors": self._emb_h[rows].copy(),
                "kinds": np.array([self.kinds.name(self._kind_h[r])
                                   for r in rows], dtype=object),
                "agents": np.array([self.agents.name(self._agent_h[r])
                                    for r in rows], dtype=object),
            }
