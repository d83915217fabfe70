"""HTTP/REST surface (aiohttp).

Route parity with cortex-server/src/http/routes.rs:58-130 (~35 routes):
health, metrics, stats, node CRUD + patch + neighbors, edges, /search
(decay re-rank + access recording), /search/hybrid, /viz, /graph/export,
auto-linker status/trigger, /briefing/:agent, agent-prompt binding
(uses edges), resolved-prompt, active-variant (epsilon-greedy),
variant-history, observe, prompt CRUD/versions/branch/performance,
deploy / rollback-status / unquarantine, /events/stream SSE.

Auth: bearer token middleware (http/auth.rs), /metrics optionally exempt.
Gate: POST /nodes runs the 4-check write gate; bypass via ?gate=skip +
x-gate-override: true header, schema still enforced (routes.rs:390-391,
:468).
"""

from __future__ import annotations

import asyncio
import json
import random
import time
from typing import Any, Dict, List, Optional

from aiohttp import web

from ..errors import (CortexError, DuplicateEdge, InvalidEdge, NodeNotFound,
                      PromptError, QueryParseError, ValidationError)
from ..gate import WriteGate
from ..graph import BOTH, PathRequest, TraversalRequest
from ..prompt import (ContextSignals, PromptContent, observation_score,
                      score_variant, context_fit, update_edge_weight)
from ..storage.base import NodeFilter
# importing .shard already executes the full vector package __init__
# (jax and friends), so take both names from the package surface
from ..vector import DeviceFetchTimeout, VectorFilter
from ..types import Edge, EdgeProvenance, Node, Source
from ..query import parse_and_compile
from .batcher import BatcherClosed
from .state import ServerState
from .viz import VIZ_HTML

import numpy as np


def q_int(request: web.Request, name: str, default: int) -> int:
    """Query-param int with a 422 (ValidationError) on garbage instead
    of an uncaught ValueError 500 — the JSON error contract covers
    malformed client input ('never a naked 500')."""
    raw = request.query.get(name)
    if raw is None:
        return default
    try:
        return int(raw)
    except ValueError:
        raise ValidationError(f"{name} must be an integer, got {raw!r}")


def q_float(request: web.Request, name: str,
            default: Optional[float]) -> Optional[float]:
    raw = request.query.get(name)
    if raw is None:
        return default
    try:
        return float(raw)
    except ValueError:
        raise ValidationError(f"{name} must be a number, got {raw!r}")


def json_ok(data: Any, status: int = 200) -> web.Response:
    return web.json_response({"ok": True, "data": data}, status=status)


def json_err(message: str, status: int = 400,
             extra: Optional[Dict[str, Any]] = None,
             headers: Optional[Dict[str, str]] = None) -> web.Response:
    body = {"ok": False, "error": message}
    if extra:
        body.update(extra)
    return web.json_response(body, status=status, headers=headers)


def node_json(n: Node) -> Dict[str, Any]:
    d = n.to_dict()
    d.pop("embedding", None)      # wire responses exclude raw vectors
    return d


def edge_json(e: Edge) -> Dict[str, Any]:
    return e.to_dict()


# ---------------------------------------------------------------------------
# middlewares
# ---------------------------------------------------------------------------


@web.middleware
async def error_middleware(request: web.Request, handler):
    try:
        return await handler(request)
    except web.HTTPException:
        raise
    except json.JSONDecodeError as e:
        return json_err(f"invalid JSON body: {e}", 400)
    except (ValidationError, QueryParseError, InvalidEdge) as e:
        return json_err(str(e), 422)
    except DuplicateEdge as e:
        return json_err(str(e), 409)
    except NodeNotFound as e:
        return json_err(str(e), 404)
    except PromptError as e:
        return json_err(str(e), 400)
    except DeviceFetchTimeout as e:
        # even the locked re-dispatch path gave up: the device/tunnel
        # is wedged. 503 + Retry-After (the fetch watchdog usually
        # recovers on a later dispatch), never a naked 500
        return json_err(f"device unavailable: {e}", 503,
                        headers={"Retry-After": "5"})
    except CortexError as e:
        return json_err(str(e), 500)
    except Exception as e:  # noqa: BLE001 — keep the JSON contract
        # a genuine server bug (or an XLA failure surfacing as a bare
        # RuntimeError): still a 500, but logged with traceback and
        # JSON-shaped — clients never see aiohttp's text/plain page
        import logging
        logging.getLogger("cortex.http").exception(
            "unhandled error on %s %s", request.method, request.path)
        return json_err(f"internal error: {e}", 500)


def make_auth_middleware(state: ServerState):
    @web.middleware
    async def auth_middleware(request: web.Request, handler):
        token = state.auth_token
        if token:
            exempt = (request.path == "/metrics"
                      and state.cortex.config.observability
                      .metrics_auth_exempt) or request.path == "/health"
            if not exempt:
                hdr = request.headers.get("Authorization", "")
                if hdr != f"Bearer {token}":
                    return json_err("unauthorized", 401)
        return await handler(request)
    return auth_middleware


def make_metrics_middleware(state: ServerState):
    @web.middleware
    async def metrics_middleware(request: web.Request, handler):
        try:
            resp = await handler(request)
            state.metrics.record_http(request.method, resp.status)
            return resp
        except web.HTTPException as e:
            state.metrics.record_http(request.method, e.status)
            raise
    return metrics_middleware


# ---------------------------------------------------------------------------
# handlers
# ---------------------------------------------------------------------------


def create_app(state: ServerState) -> web.Application:
    cx = state.cortex
    app = web.Application(middlewares=[
        error_middleware,
        make_auth_middleware(state),
        make_metrics_middleware(state),
    ])

    # ------------------------------------------------------------- basics
    async def health(request):
        from .. import __version__
        return json_ok({"status": "healthy", "version": __version__})

    async def metrics_handler(request):
        state.metrics.mirror_storage(cx.stats())
        state.metrics.mirror_linker(cx.linker.metrics)
        if state.batcher is not None:
            state.metrics.set_gauge("cortex_admission_batches_total",
                                    state.batcher.batches)
            state.metrics.set_gauge("cortex_admission_items_total",
                                    state.batcher.items)
        if state.search_batcher is not None:
            state.metrics.set_gauge("cortex_search_batches_total",
                                    state.search_batcher.batches)
            state.metrics.set_gauge("cortex_search_batch_items_total",
                                    state.search_batcher.items)
        return web.Response(text=state.metrics.render(),
                           content_type="text/plain")

    async def stats(request):
        s = cx.stats()
        return json_ok({
            "node_count": s.node_count, "edge_count": s.edge_count,
            "deleted_node_count": s.deleted_node_count,
            "nodes_by_kind": s.nodes_by_kind,
            "edges_by_relation": s.edges_by_relation,
            "db_size_bytes": s.db_size_bytes,
            "index_size": len(cx.index),
            "index": cx.index.index_info(),
        })

    # -------------------------------------------------------------- nodes
    def _node_from_body(body: Dict[str, Any], request) -> Node:
        agent = request.headers.get("x-agent-id", body.get("agent", "http"))
        n = Node.new(
            body.get("kind", "fact"), body.get("title", ""),
            body.get("body", ""),
            Source(agent=agent, session=body.get("session"),
                   channel=body.get("channel")),
            float(body.get("importance", 0.5)))
        n.tags = list(body.get("tags", []))
        n.metadata = dict(body.get("metadata", {}))
        return n

    async def create_node(request):
        body = await request.json()
        n = _node_from_body(body, request)
        skip = (request.query.get("gate") == "skip"
                and request.headers.get("x-gate-override") == "true")
        if state.batcher is not None:
            # batched admission: concurrent writes share one device
            # embed call (SURVEY §3.2)
            from ..vector.embedding import embedding_input
            emb = await state.batcher.embed(embedding_input(n))
            n.embedding = emb.tolist()
        else:
            n.embedding = cx.embedder.embed_node(n).tolist()
        # ONE admission pipeline for every surface: cx.store(gate=True)
        # owns classification -> gate -> persist ordering and the
        # admission lock; running it in a worker thread keeps a
        # first-compile stall off the event loop (/health, SSE)
        from ..errors import GateRejection as GateRejectionError
        try:
            await asyncio.to_thread(cx.store, n, gate=True,
                                    skip_quality=skip,
                                    actor=n.source.agent)
        except GateRejectionError as rej:
            state.metrics.record_gate("reject", rej.check)
            return json_err(rej.reason, 422, extra={
                "check": rej.check, "suggestion": rej.suggestion,
                "existing_node": rej.existing_node,
                "existing_title": rej.existing_title})
        state.metrics.record_gate("skip" if skip else "pass")
        return json_ok(node_json(n), status=201)

    async def list_nodes(request):
        q = request.query
        if "q" in q:        # DSL filter
            flt = parse_and_compile(q["q"])
        else:
            flt = NodeFilter(
                kinds=q["kind"].split(",") if "kind" in q else None,
                tags=q["tags"].split(",") if "tags" in q else None,
                source_agent=q.get("agent"),
                min_importance=float(q["min_importance"])
                if "min_importance" in q else None,
                include_deleted=q.get("include_deleted") == "true",
                limit=int(q.get("limit", 100)),
                offset=int(q.get("offset", 0)))
        nodes = cx.list_nodes(flt)
        return json_ok([node_json(n) for n in nodes])

    async def get_node(request):
        n = cx.get_node(request.match_info["id"])
        if n is None:
            return json_err("node not found", 404)
        return json_ok(node_json(n))

    async def patch_node(request):
        n = cx.get_node(request.match_info["id"])
        if n is None:
            return json_err("node not found", 404)
        body = await request.json()
        for fld in ("title", "body", "kind"):
            if fld in body:
                setattr(n, fld, body[fld])
        if "importance" in body:
            n.importance = float(body["importance"])
        if "tags" in body:
            n.tags = list(body["tags"])
        if "metadata" in body:
            n.metadata = dict(body["metadata"])
        await asyncio.to_thread(cx.update_node, n)   # re-embeds on device
        return json_ok(node_json(n))

    async def delete_node(request):
        hard = request.query.get("hard") == "true"
        ok = cx.delete_node(request.match_info["id"], hard=hard)
        if not ok:
            return json_err("node not found", 404)
        return json_ok({"deleted": True, "hard": hard})

    async def node_neighbors(request):
        nid = request.match_info["id"]
        depth = q_int(request, "depth", 1)
        # the CLI and the MCP bridge both SEND ?direction= — the route
        # silently ignored it, returning the BOTH subgraph for every
        # enum value
        from .conversions import parse_direction
        direction = parse_direction(
            request.query.get("direction", "both"))
        sub = cx.neighborhood(nid, depth=depth, direction=direction)
        return json_ok({
            "nodes": [node_json(n) for n in sub.nodes.values()],
            "edges": [edge_json(e) for e in sub.edges],
            "depths": sub.depths,
            "truncated": sub.truncated,   # SDKs parse this (budget hit)
        })

    # -------------------------------------------------------------- edges
    async def create_edge(request):
        body = await request.json()
        prov = EdgeProvenance.manual(
            request.headers.get("x-agent-id", "http"))
        e = Edge.new(body["from"], body["to"], body.get("relation",
                                                        "related_to"),
                     float(body.get("weight", 1.0)), prov)
        cx.create_edge(e)
        return json_ok(edge_json(e), status=201)

    async def get_edge(request):
        e = cx.storage.get_edge(request.match_info["id"])
        if e is None:
            return json_err("edge not found", 404)
        return json_ok(edge_json(e))

    async def delete_edge(request):
        ok = cx.delete_edge(request.match_info["id"])
        if not ok:
            return json_err("edge not found", 404)
        return json_ok({"deleted": True})

    # ------------------------------------------------------------- search
    async def search(request):
        q = request.query.get("q", "")
        if not q:
            return json_err("missing q parameter", 400)
        limit = q_int(request, "limit", 10)
        kinds = request.query.get("kind")
        agent_f = request.query.get("agent")
        flt = None
        if kinds or agent_f:
            flt = VectorFilter(kinds=kinds.split(",") if kinds else None,
                               source_agent=agent_f)
        t0 = time.perf_counter()
        rb = q_float(request, "recency_bias", None)
        # ?decay=false disables the score-decay re-rank (the CLI's
        # --no-decay; local library mode always had the knob)
        decay = request.query.get("decay", "true").lower() != "false"
        hits = None
        if state.search_batcher is not None:
            # read-side coalescing: concurrent searches share one
            # embed_batch + search_batch device dispatch; the decay
            # re-rank + access recording stay per-request
            raw_hits = None
            try:
                raw_hits = await state.search_batcher.search(
                    q, cx.overfetch_k(limit, decay), flt)
            except BatcherClosed:
                # a request racing shutdown — the direct path below
                # still works (ADVICE r2 #3). ONLY this case falls
                # back: any other error (XLA device failures are
                # RuntimeError subclasses) must surface, not re-run
                # against the same broken device
                raw_hits = None
            if raw_hits is not None:
                hits = await asyncio.to_thread(
                    cx.finish_search, raw_hits, limit, decay=decay,
                    recency_bias=rb)
        if hits is None:
            hits = await asyncio.to_thread(
                cx.search, q, limit=limit, flt=flt, decay=decay,
                recency_bias=rb)
        state.metrics.record_search("search", time.perf_counter() - t0)
        return json_ok([{"score": s, "node": node_json(n)}
                        for s, n in hits])

    async def hybrid_search(request):
        q = request.query.get("q", "")
        if not q:
            return json_err("missing q parameter", 400)
        anchors = [a for a in
                   request.query.get("anchors", "").split(",") if a]
        limit = q_int(request, "limit", 10)
        w = q_float(request, "vector_weight", 0.7)
        kinds = request.query.get("kind")
        t0 = time.perf_counter()
        res = await asyncio.to_thread(
            cx.search_hybrid,
            q, anchors=anchors, limit=limit, vector_weight=w,
            kind_filter=kinds.split(",") if kinds else None,
            max_anchor_depth=q_int(request, "max_anchor_depth", 3))
        state.metrics.record_search("hybrid", time.perf_counter() - t0)
        return json_ok([{
            "node": node_json(r.node),
            "vector_score": r.vector_score,
            "graph_score": r.graph_score,
            "combined_score": r.combined_score,
            "nearest_anchor": ({"id": r.nearest_anchor[0],
                                "depth": r.nearest_anchor[1]}
                               if r.nearest_anchor else None),
        } for r in res])

    # ---------------------------------------------------------- graph misc
    async def graph_viz(request):
        return web.Response(text=VIZ_HTML, content_type="text/html")

    async def graph_export(request):
        nodes = cx.list_nodes(NodeFilter(limit=int(
            request.query.get("limit", 10_000))))
        edges = cx.storage.all_edges()
        return json_ok({
            "nodes": [node_json(n) for n in nodes],
            "edges": [edge_json(e) for e in edges],
        })

    async def auto_linker_status(request):
        m = cx.linker.metrics
        return json_ok({**m.to_dict(), "summary": m.summary()})

    async def trigger_auto_link(request):
        m = await asyncio.get_event_loop().run_in_executor(
            None, cx.run_linker_cycle)
        state.metrics.mirror_linker(m)
        return json_ok({"summary": m.summary(),
                        "edges_created": m.cycle_edges_created,
                        "nodes_processed": m.cycle_nodes_processed})

    async def get_briefing(request):
        agent_id = request.match_info["agent_id"]
        compact = request.query.get("compact") == "true"
        fmt = request.query.get("format", "text")
        b = await asyncio.to_thread(cx.briefing_engine.generate, agent_id)
        if fmt == "json":
            return json_ok({
                "agent_id": b.agent_id, "generated_at": b.generated_at,
                "nodes_consulted": b.nodes_consulted, "cached": b.cached,
                "text": cx.briefing_engine.render(b, compact=compact),
                "sections": [{"title": s.title,
                              "nodes": [node_json(n) for n in s.nodes]}
                             for s in b.sections]})
        return web.Response(
            text=cx.briefing_engine.render(b, compact=compact),
            content_type="text/markdown")

    # ----------------------------------------------- agent-prompt binding
    def _find_agent(name: str) -> Optional[Node]:
        for n in cx.list_nodes(NodeFilter(kinds=["agent"], limit=100)):
            if n.title == name or n.source.agent == name:
                return n
        return None

    async def list_agent_prompts(request):
        agent = _find_agent(request.match_info["name"])
        if agent is None:
            return json_err("agent not found", 404)
        out = []
        for e in cx.storage.edges_from(agent.id):
            if e.relation != "uses":
                continue
            p = cx.get_node(e.to_id)
            if p is not None:
                out.append({"prompt_node_id": p.id, "title": p.title,
                            "weight": e.weight})
        return json_ok(out)

    async def bind_prompt(request):
        name = request.match_info["name"]
        slug = request.match_info["slug"]
        agent = _find_agent(name)
        if agent is None:
            agent = Node.new("agent", name, f"Agent node for {name}",
                             Source(agent=name), 0.8)
            # embed+persist off the event loop (a first-compile embed
            # stall here would block /health and SSE — ADVICE r1 #3)
            await asyncio.to_thread(cx.store, agent)
        head = cx.prompts.find_head(slug,
                                    request.query.get("branch", "main"))
        if head is None:
            return json_err(f"prompt '{slug}' not found", 404)
        try:
            e = Edge.new(agent.id, head.id, "uses", 0.5,
                         EdgeProvenance.manual(name))
            cx.create_edge(e)
        except DuplicateEdge:
            pass
        return json_ok({"agent": agent.id, "prompt": head.id})

    async def unbind_prompt(request):
        agent = _find_agent(request.match_info["name"])
        if agent is None:
            return json_err("agent not found", 404)
        slug = request.match_info["slug"]
        removed = 0
        for e in cx.storage.edges_from(agent.id):
            if e.relation != "uses":
                continue
            p = cx.get_node(e.to_id)
            c = PromptContent.try_from_node(p) if p else None
            if c is not None and c.slug == slug:
                cx.delete_edge(e.id)
                removed += 1
        return json_ok({"removed": removed})

    async def resolved_prompt(request):
        agent = _find_agent(request.match_info["name"])
        if agent is None:
            return json_err("agent not found", 404)
        # resolve the highest-weight bound prompt
        uses = [(e, cx.get_node(e.to_id))
                for e in cx.storage.edges_from(agent.id)
                if e.relation == "uses"]
        uses = [(e, p) for e, p in uses if p is not None]
        if not uses:
            return json_err("agent has no bound prompts", 404)
        uses.sort(key=lambda t: -t[0].weight)
        r = cx.prompts.resolve(uses[0][1])
        return json_ok({
            "slug": r.slug, "type": r.prompt_type, "version": r.version,
            "branch": r.branch, "content": r.content, "lineage": r.lineage,
            "skills": r.skills, "node_id": r.node_id})

    # ------------------------------------------------- variant selection
    async def active_variant(request):
        name = request.match_info["name"]
        agent = _find_agent(name)
        if agent is None:
            return json_err(f"Agent '{name}' not found", 404)
        q = request.query
        signals = ContextSignals(
            sentiment=float(q.get("sentiment", 0.5)),
            task_type=q.get("task_type", "casual"),
            correction_rate=float(q.get("correction_rate", 0.0)),
            topic_shift=float(q.get("topic_shift", 0.0)),
            energy=float(q.get("energy", 0.5)))
        epsilon = min(1.0, max(0.0, float(q.get("epsilon", 0.2))))
        current = agent.metadata.get("active_variant_id")

        scores = []
        for e in cx.storage.edges_from(agent.id):
            if e.relation != "uses":
                continue
            p = cx.get_node(e.to_id)
            if p is None:
                continue
            cw = p.metadata.get("context_weights")
            fit = context_fit(cw, signals)
            total = e.weight if fit is None else \
                min(1.0, max(0.0, 0.5 * e.weight + 0.5 * fit))
            scores.append({"id": p.id, "slug": p.title,
                           "edge_weight": e.weight,
                           "context_score": fit if fit is not None
                           else e.weight,
                           "total_score": total})
        if not scores:
            return json_ok({"agent": name, "selected": None,
                            "current_variant_id": current,
                            "swap_recommended": False, "epsilon": epsilon,
                            "signals": signals.__dict__,
                            "all_variants": []})
        if random.random() < epsilon:
            selected = random.choice(scores)
        else:
            selected = max(scores, key=lambda s: s["total_score"])
        scores_sorted = sorted(scores, key=lambda s: -s["total_score"])
        return json_ok({
            "agent": name, "selected": selected,
            "current_variant_id": current,
            "swap_recommended": current != selected["id"],
            "epsilon": epsilon, "signals": signals.__dict__,
            "all_variants": scores_sorted})

    async def variant_history(request):
        agent = _find_agent(request.match_info["name"])
        if agent is None:
            return json_err("agent not found", 404)
        limit = q_int(request, "limit", 20)
        ctx_filter = _parse_context_filter(request.query.get("context"))
        obs = [cx.get_node(e.to_id)
               for e in cx.storage.edges_from(agent.id)
               if e.relation == "performed"]
        obs = [o for o in obs if o is not None]
        if ctx_filter is not None:
            obs = [o for o in obs if _matches_context_filter(
                o, ctx_filter[0], ctx_filter[1])]
        obs.sort(key=lambda n: -n.created_at)
        out = []
        for o in obs[:limit]:
            md = o.metadata
            out.append({
                "id": o.id,
                "type": md.get("observation_type", "performance"),
                "variant_id": md.get("variant_id"),
                "variant_slug": md.get("variant_slug"),
                "observation_score": md.get("observation_score"),
                "sentiment_score": md.get("sentiment_score"),
                "task_outcome": md.get("task_outcome"),
                "token_cost": md.get("token_cost"),
                "response_time_ms": md.get("response_time_ms"),
                "created_at": o.created_at})
        return json_ok(out)

    async def record_observation(request):
        name = request.match_info["name"]
        agent = _find_agent(name)
        if agent is None:
            return json_err(f"Agent '{name}' not found", 404)
        body = await request.json()
        variant_id = body.get("variant_id")
        if not variant_id:
            return json_err("variant_id required", 422)
        sentiment = min(1.0, max(0.0, float(body.get("sentiment_score",
                                                     0.5))))
        corrections = int(body.get("correction_count", 0))
        outcome = body.get("task_outcome", "unknown")
        if outcome not in ("success", "partial", "failure", "unknown"):
            outcome = "unknown"
        obs_score = observation_score(sentiment, corrections, outcome)

        now = time.time()
        obs = Node.new("observation",
                       f"obs:{name}:{int(now)}",
                       json.dumps({
                           "agent": name,
                           "prompt_slug": body.get("variant_slug"),
                           "observation_type": "performance",
                           # context signals under which the variant
                           # performed — queryable later via
                           # ?context=key:value (selection.rs:772,799)
                           "context": body.get("context"),
                           "metrics": {
                               "correction_count": corrections,
                               "sentiment_score": sentiment,
                               "task_outcome": outcome,
                               "observation_score": obs_score,
                           }}),
                       Source(agent=name), obs_score)
        obs.metadata.update({
            "observation_type": "performance",
            "variant_id": variant_id,
            "variant_slug": body.get("variant_slug", ""),
            "sentiment_score": sentiment,
            "correction_count": corrections,
            "task_outcome": outcome,
            "observation_score": obs_score})
        # optional cost/latency metrics (selection.rs:316,448-452);
        # malformed values are a client error, not a 500 (ADVICE r2 #4)
        for key in ("token_cost", "response_time_ms"):
            if body.get(key) is not None:
                try:
                    obs.metadata[key] = int(body[key])
                except (ValueError, TypeError):
                    return json_err(f"{key} must be an integer", 400)
        if body.get("context_signals"):
            obs.metadata["context_signals"] = body["context_signals"]
        await asyncio.to_thread(cx.store, obs)   # embed off the event loop

        for from_id, to_id, rel, w in [
                (agent.id, obs.id, "performed", 1.0),
                (obs.id, variant_id, "informed_by", 1.0),
                (obs.id, variant_id, "observed_with", obs_score),
                (obs.id, agent.id, "observed_by", 1.0)]:
            try:
                cx.create_edge(Edge.new(from_id, to_id, rel, w,
                                        EdgeProvenance.manual(name)))
            except (DuplicateEdge, InvalidEdge):
                pass

        # EMA update on the uses edge
        old_w, new_w = None, None
        for e in cx.storage.edges_from(agent.id):
            if e.relation == "uses" and e.to_id == variant_id:
                old_w = e.weight
                new_w = update_edge_weight(e.weight, obs_score)
                cx.storage.update_edge_weight_atomic(e.id, new_w)
                break

        # mark active variant
        agent.metadata["active_variant_id"] = variant_id
        cx.storage.put_node(agent)

        # rollback monitoring
        cr = float(body.get("context_signals", {}).get(
            "correction_rate", min(corrections * 0.1, 1.0)))
        rb = cx.rollback_monitor.process_observation(
            obs.id, variant_id, cr, sentiment, obs_score)
        return json_ok({
            "observation_id": obs.id, "observation_score": obs_score,
            "old_weight": old_w, "new_weight": new_w,
            "rollback": None if rb is None else {
                "trigger": rb.trigger.kind,
                "to_version": rb.to_version,
                "is_quarantined": rb.is_quarantined}})

    # ------------------------------------------------------------ prompts
    async def list_prompts(request):
        return json_ok([p.__dict__ for p in cx.prompts.list_all_prompts()])

    async def create_prompt(request):
        body = await request.json()
        content = PromptContent(
            slug=body["slug"], prompt_type=body.get("type", "persona"),
            sections=body.get("sections", {}),
            metadata=body.get("metadata", {}),
            override_sections=body.get("override_sections", {}),
            context_weights=body.get("context_weights"))
        nid = cx.prompts.create_prompt(
            content, branch=body.get("branch", "main"),
            author=request.headers.get("x-agent-id", "http"))
        cx._on_write()
        return json_ok({"node_id": nid}, status=201)

    async def get_latest(request):
        slug = request.match_info["slug"]
        head = cx.prompts.find_head(slug,
                                    request.query.get("branch", "main"))
        if head is None:
            return json_err("prompt not found", 404)
        r = cx.prompts.resolve(head)
        return json_ok({
            "slug": r.slug, "type": r.prompt_type, "version": r.version,
            "branch": r.branch, "content": r.content, "lineage": r.lineage,
            "skills": r.skills, "node_id": r.node_id})

    async def list_versions(request):
        slug = request.match_info["slug"]
        branch = request.query.get("branch", "main")
        return json_ok([v.__dict__
                        for v in cx.prompts.list_versions(slug, branch)])

    async def create_version(request):
        slug = request.match_info["slug"]
        body = await request.json()
        content = PromptContent(
            slug=slug, prompt_type=body.get("type", "persona"),
            sections=body.get("sections", {}),
            metadata=body.get("metadata", {}),
            override_sections=body.get("override_sections", {}),
            context_weights=body.get("context_weights"))
        nid = cx.prompts.create_version(
            slug, body.get("branch", "main"), content,
            author=request.headers.get("x-agent-id", "http"))
        cx._on_write()
        return json_ok({"node_id": nid}, status=201)

    async def get_version(request):
        slug = request.match_info["slug"]
        version = int(request.match_info["version"])
        node = cx.prompts.get_version(
            slug, request.query.get("branch", "main"), version)
        if node is None:
            return json_err("version not found", 404)
        c = PromptContent.from_node(node)
        return json_ok({"node_id": node.id, "slug": c.slug,
                        "version": c.version, "branch": c.branch,
                        "sections": c.sections})

    async def create_branch(request):
        slug = request.match_info["slug"]
        body = await request.json()
        nid = cx.prompts.create_branch(
            slug, body.get("from_branch", "main"), body["new_branch"],
            base_version=body.get("base_version"),
            author=request.headers.get("x-agent-id", "http"))
        cx._on_write()
        return json_ok({"node_id": nid}, status=201)

    def _parse_context_filter(s: Optional[str]):
        """`?context=task_type:coding` -> ("task_type", "coding");
        absent/malformed (no colon, empty key or value) -> None
        (selection.rs:799-812)."""
        if not s or ":" not in s:
            return None
        key, val = s.split(":", 1)
        key, val = key.strip(), val.strip()
        return (key, val) if key and val else None

    def _matches_context_filter(obs: Node, key: str, value: str) -> bool:
        """Check body JSON `context.<key>` string equality; unreadable
        body or missing key = no match (selection.rs:815-825)."""
        try:
            body = json.loads(obs.body)
        except (json.JSONDecodeError, TypeError):
            return False
        if not isinstance(body, dict):
            return False
        ctx = body.get("context")
        return isinstance(ctx, dict) and ctx.get(key) == value

    def _collect_performance(slug: str, version: Optional[int],
                             context: Optional[str] = None
                             ) -> Dict[str, Any]:
        """Aggregate observation metrics over observed_with edges."""
        ctx_filter = _parse_context_filter(context)
        included = 0
        token_costs: List[int] = []
        response_times: List[int] = []
        scores, sentiments, corrections = [], [], []
        outcomes: Dict[str, int] = {}
        seen_obs: set = set()
        for n in cx.list_nodes(NodeFilter(kinds=["prompt"])):
            c = PromptContent.try_from_node(n)
            if c is None or c.slug != slug:
                continue
            if version is not None and c.version != version:
                continue
            for e in cx.storage.edges_to(n.id):
                if e.relation not in ("observed_with", "informed_by"):
                    continue
                o = cx.get_node(e.from_id)
                if o is None or o.kind != "observation":
                    continue
                if o.id in seen_obs:    # both relations point at the variant
                    continue
                seen_obs.add(o.id)
                if ctx_filter is not None and not _matches_context_filter(
                        o, ctx_filter[0], ctx_filter[1]):
                    continue
                included += 1
                md = o.metadata
                if "observation_score" in md:
                    scores.append(float(md["observation_score"]))
                if "sentiment_score" in md:
                    sentiments.append(float(md["sentiment_score"]))
                if "correction_count" in md:
                    corrections.append(int(md["correction_count"]))
                oc = md.get("task_outcome")
                if oc:
                    outcomes[oc] = outcomes.get(oc, 0) + 1
                # averaged over the observations that carry them only
                # (selection.rs aggregate: token_cost_partial)
                if md.get("token_cost") is not None:
                    token_costs.append(int(md["token_cost"]))
                if md.get("response_time_ms") is not None:
                    response_times.append(int(md["response_time_ms"]))
        n_obs = included          # post-context-filter count
        return {
            "slug": slug, "version": version, "observations": n_obs,
            "context_filter": context,
            "avg_observation_score": sum(scores) / n_obs if n_obs else None,
            "avg_sentiment": (sum(sentiments) / len(sentiments)
                              if sentiments else None),
            "avg_corrections": (sum(corrections) / len(corrections)
                                if corrections else None),
            "avg_token_cost": (sum(token_costs) / len(token_costs)
                               if token_costs else None),
            "avg_response_time_ms": (
                sum(response_times) / len(response_times)
                if response_times else None),
            "outcomes": outcomes,
        }

    async def prompt_performance(request):
        return json_ok(_collect_performance(
            request.match_info["slug"], None,
            context=request.query.get("context")))

    async def version_performance(request):
        return json_ok(_collect_performance(
            request.match_info["slug"],
            int(request.match_info["version"]),
            context=request.query.get("context")))

    # ------------------------------------------------------------ rollback
    async def deploy_prompt(request):
        slug = request.match_info["slug"]
        body = await request.json()
        branch = body.get("branch", "main")
        head = cx.prompts.find_head(slug, branch)
        if head is None:
            return json_err("prompt not found", 404)
        c = PromptContent.from_node(head)
        baseline = [(float(a), float(b))
                    for a, b in body.get("baseline_observations", [])]
        dep_id = cx.rollback_monitor.record_deployment(
            slug, branch, c.version, head.id,
            body.get("agent_name", "system"), baseline)
        cx._on_write()
        return json_ok({"deployment_node_id": dep_id,
                        "prompt_node_id": head.id,
                        "version": c.version}, status=201)

    async def rollback_status(request):
        st = cx.rollback_monitor.get_status(
            request.match_info["slug"],
            request.query.get("branch", "main"))
        if st is None:
            return json_err("prompt not found", 404)
        return json_ok({
            "slug": st.slug, "branch": st.branch,
            "head_node_id": st.head_node_id,
            "current_version": st.current_version,
            "is_quarantined": st.is_quarantined,
            "rollback_count": st.rollback_count,
            "cooldown_expires_at": st.cooldown_expires_at,
            "active_deployment": (st.active_deployment.__dict__
                                  if st.active_deployment else None),
            "recent_rollbacks": [r.__dict__ for r in st.recent_rollbacks]})

    async def unquarantine_prompt(request):
        body = await request.json()
        node_id = body.get("node_id")
        if node_id is None:
            head = cx.prompts.find_head(request.match_info["slug"],
                                        body.get("branch", "main"))
            if head is None:
                return json_err("prompt not found", 404)
            node_id = head.id
        cx.rollback_monitor.unquarantine(node_id)
        return json_ok({"unquarantined": node_id})

    # ------------------------------------------------------------------ SSE
    async def event_stream(request):
        wanted = set(f for f in
                     request.query.get("events", "").split(",") if f)
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
            "Connection": "keep-alive"})
        await resp.prepare(request)
        q = state.bus.subscribe()
        try:
            while True:
                try:
                    ev = await asyncio.wait_for(q.get(), timeout=15.0)
                except asyncio.TimeoutError:
                    await resp.write(b": keepalive\n\n")
                    continue
                if wanted and ev.event_type not in wanted:
                    continue
                await resp.write(ev.to_sse().encode())
        except (ConnectionResetError, asyncio.CancelledError):
            pass
        finally:
            state.bus.unsubscribe(q)
        return resp

    # ------------------------------------------------------------- routes
    app.router.add_get("/health", health)
    app.router.add_get("/metrics", metrics_handler)
    app.router.add_get("/stats", stats)
    app.router.add_get("/nodes", list_nodes)
    app.router.add_post("/nodes", create_node)
    app.router.add_get("/nodes/{id}", get_node)
    app.router.add_patch("/nodes/{id}", patch_node)
    app.router.add_delete("/nodes/{id}", delete_node)
    app.router.add_get("/nodes/{id}/neighbors", node_neighbors)
    app.router.add_post("/edges", create_edge)
    app.router.add_get("/edges/{id}", get_edge)
    app.router.add_delete("/edges/{id}", delete_edge)
    app.router.add_get("/search", search)
    app.router.add_get("/search/hybrid", hybrid_search)
    app.router.add_get("/viz", graph_viz)
    app.router.add_get("/graph/viz", graph_viz)
    app.router.add_get("/graph/export", graph_export)
    app.router.add_get("/auto-linker/status", auto_linker_status)
    app.router.add_post("/auto-linker/trigger", trigger_auto_link)
    app.router.add_get("/briefing/{agent_id}", get_briefing)
    app.router.add_get("/agents/{name}/prompts", list_agent_prompts)
    app.router.add_put("/agents/{name}/prompts/{slug}", bind_prompt)
    app.router.add_delete("/agents/{name}/prompts/{slug}", unbind_prompt)
    app.router.add_get("/agents/{name}/resolved-prompt", resolved_prompt)
    app.router.add_get("/agents/{name}/active-variant", active_variant)
    app.router.add_get("/agents/{name}/variant-history", variant_history)
    app.router.add_post("/agents/{name}/observe", record_observation)
    app.router.add_get("/prompts", list_prompts)
    app.router.add_post("/prompts", create_prompt)
    app.router.add_get("/prompts/{slug}/latest", get_latest)
    app.router.add_get("/prompts/{slug}/versions", list_versions)
    app.router.add_post("/prompts/{slug}/versions", create_version)
    app.router.add_get("/prompts/{slug}/versions/{version}", get_version)
    app.router.add_get("/prompts/{slug}/versions/{version}/performance",
                       version_performance)
    app.router.add_post("/prompts/{slug}/branch", create_branch)
    app.router.add_get("/prompts/{slug}/performance", prompt_performance)
    app.router.add_post("/prompts/{slug}/deploy", deploy_prompt)
    app.router.add_get("/prompts/{slug}/rollback-status", rollback_status)
    app.router.add_post("/prompts/{slug}/unquarantine", unquarantine_prompt)
    app.router.add_get("/events/stream", event_stream)
    return app
