"""Agent + prompt CLI command families.

Parity: cortex-server/src/cli/mod.rs Agent{List,Show,Bind,Unbind,
Resolve,Select,History,Observe} and Prompt{List,Get,Migrate,
Performance,Deploy,RollbackStatus,Unquarantine}. Embedded-mode logic
mirrors the HTTP selection/rollback handlers; with --server the same
operations go over REST.
"""

from __future__ import annotations

import json
import time
from typing import Optional

from ..prompt import (ContextSignals, PromptContent, context_fit,
                      observation_score)
from ..storage.base import NodeFilter
from ..types import Edge, EdgeProvenance, Node, Source


def _emit(args, data, human=None):
    from .main import emit
    emit(args, data, human)


def _err(msg):
    from .main import CliError
    raise CliError(msg)


def _find_agent(cx, name: str) -> Optional[Node]:
    for n in cx.list_nodes(NodeFilter(kinds=["agent"])):
        if n.title == name or n.source.agent == name:
            return n
    return None


def _require_agent(cx, name: str) -> Node:
    a = _find_agent(cx, name)
    if a is None:
        _err(f"agent '{name}' not found")
    return a


# ------------------------------------------------------------------ agent


def cmd_agent_list(ctx, args) -> int:
    if ctx.remote:
        nodes = ctx.http("GET", "/nodes", params={"kind": "agent"})
        rows = []
        for n in nodes:
            name = n.get("data", {}).get("title", "")
            try:
                bound = len(ctx.http(
                    "GET", f"/agents/{name}/prompts"))
            except Exception:  # noqa: BLE001 — count is best-effort
                bound = 0
            rows.append({"id": n["id"], "name": name,
                         "bound_prompts": bound,
                         "importance": n.get("importance")})
        _emit(args, rows, "\n".join(
            f"{r['id'][:13]}…  {r['name']:<24} "
            f"prompts={r['bound_prompts']}" for r in rows)
            or "(no agents)")
        return 0
    cx = ctx.cortex()
    rows = []
    for n in cx.list_nodes(NodeFilter(kinds=["agent"])):
        bound = sum(1 for e in cx.storage.edges_from(n.id)
                    if e.relation == "uses")
        rows.append({"id": n.id, "name": n.title, "bound_prompts": bound,
                     "importance": n.importance})
    _emit(args, rows, "\n".join(
        f"{r['id'][:13]}…  {r['name']:<24} prompts={r['bound_prompts']}"
        for r in rows) or "(no agents)")
    return 0


def cmd_agent_show(ctx, args) -> int:
    if ctx.remote:
        nodes = ctx.http("GET", "/nodes", params={"kind": "agent"})
        match = [n for n in nodes
                 if n.get("data", {}).get("title") == args.name
                 or n.get("source", {}).get("agent") == args.name]
        if not match:
            _err(f"agent '{args.name}' not found")
        n = match[0]
        prompts = ctx.http("GET", f"/agents/{args.name}/prompts")
        d = {"id": n["id"], "name": n["data"]["title"],
             "body": n["data"].get("body"),
             "importance": n.get("importance"),
             "metadata": n["data"].get("metadata", {}),
             "bound_prompts": prompts}
        _emit(args, d, json.dumps(d, indent=2, default=str))
        return 0
    cx = ctx.cortex()
    a = _require_agent(cx, args.name)
    prompts = []
    for e in cx.storage.edges_from(a.id):
        if e.relation != "uses":
            continue
        p = cx.get_node(e.to_id)
        if p is not None:
            c = PromptContent.try_from_node(p)
            prompts.append({"node_id": p.id, "weight": e.weight,
                            "slug": c.slug if c else p.title,
                            "version": c.version if c else None})
    d = {"id": a.id, "name": a.title, "body": a.body,
         "importance": a.importance, "metadata": a.metadata,
         "bound_prompts": prompts}
    _emit(args, d, json.dumps(d, indent=2, default=str))
    return 0


def cmd_agent_bind(ctx, args) -> int:
    if ctx.remote:
        d = ctx.http("PUT", f"/agents/{args.name}/prompts/{args.slug}",
                     params={"branch": args.branch})
        _emit(args, d, f"bound {args.slug} to {args.name}")
        return 0
    cx = ctx.cortex()
    agent = _find_agent(cx, args.name)
    if agent is None:
        agent = Node.new("agent", args.name, f"Agent node for {args.name}",
                         Source(agent=args.name), 0.8)
        cx.store(agent)
    head = cx.prompts.find_head(args.slug, args.branch)
    if head is None:
        _err(f"prompt '{args.slug}' not found")
    from ..errors import DuplicateEdge
    try:
        cx.create_edge(Edge.new(agent.id, head.id, "uses", 0.5,
                                EdgeProvenance.manual(args.name)))
    except DuplicateEdge:
        pass
    _emit(args, {"agent": agent.id, "prompt": head.id},
          f"bound {args.slug}@{args.branch} to {args.name}")
    return 0


def cmd_agent_unbind(ctx, args) -> int:
    if ctx.remote:
        d = ctx.http("DELETE", f"/agents/{args.name}/prompts/{args.slug}")
        _emit(args, d, f"unbound {args.slug} from {args.name}")
        return 0
    cx = ctx.cortex()
    agent = _require_agent(cx, args.name)
    removed = 0
    for e in cx.storage.edges_from(agent.id):
        if e.relation != "uses":
            continue
        p = cx.get_node(e.to_id)
        c = PromptContent.try_from_node(p) if p else None
        if c is not None and c.slug == args.slug:
            cx.delete_edge(e.id)
            removed += 1
    _emit(args, {"removed": removed},
          f"unbound {removed} binding(s) of {args.slug}")
    return 0


def cmd_agent_resolve(ctx, args) -> int:
    if ctx.remote:
        d = ctx.http("GET", f"/agents/{args.name}/resolved-prompt")
        _emit(args, d, json.dumps(d, indent=2, default=str))
        return 0
    cx = ctx.cortex()
    agent = _require_agent(cx, args.name)
    uses = [(e, cx.get_node(e.to_id))
            for e in cx.storage.edges_from(agent.id) if e.relation == "uses"]
    uses = [(e, p) for e, p in uses if p is not None]
    if not uses:
        _err(f"agent '{args.name}' has no bound prompts")
    uses.sort(key=lambda t: -t[0].weight)
    r = cx.prompts.resolve(uses[0][1])
    d = {"slug": r.slug, "type": r.prompt_type, "version": r.version,
         "branch": r.branch, "content": r.content, "lineage": r.lineage,
         "skills": r.skills, "node_id": r.node_id}
    _emit(args, d, json.dumps(d, indent=2, default=str))
    return 0


def cmd_agent_select(ctx, args) -> int:
    """Context-aware variant scoring (ε=0 deterministic listing of
    scores; the ε-greedy draw itself is an HTTP-layer concern)."""
    if ctx.remote:
        d = ctx.http("GET", f"/agents/{args.name}/active-variant", params={
            "sentiment": args.sentiment, "task_type": args.task_type,
            "correction_rate": args.correction_rate,
            "epsilon": args.epsilon})
        _emit(args, d, json.dumps(d, indent=2, default=str))
        return 0
    cx = ctx.cortex()
    agent = _require_agent(cx, args.name)
    signals = ContextSignals(sentiment=args.sentiment,
                             task_type=args.task_type,
                             correction_rate=args.correction_rate)
    scores = []
    for e in cx.storage.edges_from(agent.id):
        if e.relation != "uses":
            continue
        p = cx.get_node(e.to_id)
        if p is None:
            continue
        fit = context_fit(p.metadata.get("context_weights"), signals)
        total = e.weight if fit is None else \
            min(1.0, max(0.0, 0.5 * e.weight + 0.5 * fit))
        scores.append({"id": p.id, "slug": p.title,
                       "edge_weight": e.weight, "total_score": total})
    scores.sort(key=lambda s: -s["total_score"])
    _emit(args, scores, "\n".join(
        f"{s['total_score']:.3f}  (edge {s['edge_weight']:.2f})  {s['slug']}"
        for s in scores) or "(no variants)")
    return 0


def cmd_agent_history(ctx, args) -> int:
    if ctx.remote:
        d = ctx.http("GET", f"/agents/{args.name}/variant-history",
                     params={"limit": args.limit})
        _emit(args, d, json.dumps(d, indent=2, default=str))
        return 0
    cx = ctx.cortex()
    agent = _require_agent(cx, args.name)
    obs = [cx.get_node(e.to_id) for e in cx.storage.edges_from(agent.id)
           if e.relation == "performed"]
    obs = sorted((o for o in obs if o is not None),
                 key=lambda n: -n.created_at)[:args.limit]
    rows = [{"id": o.id, "score": o.metadata.get("observation_score"),
             "variant": o.metadata.get("variant_slug"),
             "outcome": o.metadata.get("task_outcome"),
             "created_at": o.created_at} for o in obs]
    _emit(args, rows, "\n".join(
        f"{time.strftime('%m-%d %H:%M', time.localtime(r['created_at']))}  "
        f"score={r['score']}  {r['variant']} ({r['outcome']})"
        for r in rows) or "(no observations)")
    return 0


def cmd_agent_observe(ctx, args) -> int:
    body = {"variant_id": args.variant_id,
            "sentiment_score": args.sentiment,
            "correction_count": args.corrections,
            "task_outcome": args.outcome}
    if ctx.remote:
        d = ctx.http("POST", f"/agents/{args.name}/observe", body=body)
        _emit(args, d, f"recorded observation (score="
              f"{d.get('observation_score')})")
        return 0
    cx = ctx.cortex()
    agent = _require_agent(cx, args.name)
    score = observation_score(args.sentiment, args.corrections,
                              args.outcome)
    # resolve the variant's slug so history rows can display it (the
    # HTTP path writes variant_slug; `agent history` reads it)
    try:
        vnode = cx.get_node(args.variant_id)
        c = PromptContent.try_from_node(vnode) if vnode else None
        variant_slug = c.slug if c else (vnode.title if vnode else "")
    except Exception:  # noqa: BLE001 — unknown/foreign variant id
        variant_slug = ""
    now = time.time()
    obs = Node.new("observation", f"obs:{args.name}:{int(now)}",
                   json.dumps({"agent": args.name,
                               "observation_type": "performance"}),
                   Source(agent=args.name), 0.4)
    obs.metadata = {"observation_type": "performance",
                    "variant_id": args.variant_id,
                    "variant_slug": variant_slug,
                    "observation_score": score,
                    "sentiment_score": args.sentiment,
                    "correction_count": args.corrections,
                    "task_outcome": args.outcome}
    cx.store(obs)
    # edge writes tolerate a typo'd variant id (InvalidEdge) exactly
    # like the HTTP handler — an orphan observation must not abort the
    # command mid-bookkeeping
    from ..errors import DuplicateEdge, InvalidEdge
    for from_id, to_id, rel, w in [
            (agent.id, obs.id, "performed", score),
            (obs.id, args.variant_id, "observed_with", score)]:
        try:
            cx.create_edge(Edge.new(from_id, to_id, rel, w,
                                    EdgeProvenance.manual(args.name)))
        except (DuplicateEdge, InvalidEdge):
            pass
    # selection bookkeeping, mirroring http.record_observation: the
    # uses-edge EMA and the active-variant marker — without them
    # embedded `agent select` never learns from observations
    from ..prompt import update_edge_weight
    for e in cx.storage.edges_from(agent.id):
        if e.relation == "uses" and e.to_id == args.variant_id:
            cx.storage.update_edge_weight_atomic(
                e.id, update_edge_weight(e.weight, score))
            break
    agent.metadata["active_variant_id"] = args.variant_id
    cx.storage.put_node(agent)
    corr_rate = min(1.0, args.corrections / 10.0)
    outcome = cx.rollback_monitor.process_observation(
        obs.id, args.variant_id, corr_rate, args.sentiment, score)
    _emit(args, {"observation": obs.id, "score": score,
                 "rollback_triggered": bool(outcome)},
          f"recorded observation {obs.id[:13]}… score={score:.3f}"
          + (" [ROLLBACK TRIGGERED]" if outcome else ""))
    return 0


# ----------------------------------------------------------------- prompt


def cmd_prompt_list(ctx, args) -> int:
    if ctx.remote:
        rows = ctx.http("GET", "/prompts")
        _emit(args, rows, "\n".join(
            f"{r.get('slug', ''):<28} {r.get('prompt_type', ''):<10} "
            f"{r.get('branch', '')}@v{r.get('version', '')}"
            for r in rows) or "(no prompts)")
        return 0
    cx = ctx.cortex()
    rows = [{"slug": p.slug, "type": p.prompt_type, "branch": p.branch,
             "version": p.version, "node_id": p.node_id}
            for p in cx.prompts.list_all_prompts()]
    _emit(args, rows, "\n".join(
        f"{r['slug']:<28} {r['type']:<10} {r['branch']}@v{r['version']}"
        for r in rows) or "(no prompts)")
    return 0


def cmd_prompt_get(ctx, args) -> int:
    if ctx.remote:
        d = ctx.http("GET", f"/prompts/{args.slug}/latest",
                     params={"branch": args.branch})
        _emit(args, d, json.dumps(d, indent=2, default=str))
        return 0
    cx = ctx.cortex()
    head = cx.prompts.find_head(args.slug, args.branch)
    if head is None:
        _err(f"prompt '{args.slug}' not found on branch {args.branch}")
    r = cx.prompts.resolve(head)
    d = {"slug": r.slug, "type": r.prompt_type, "version": r.version,
         "branch": r.branch, "content": r.content, "lineage": r.lineage,
         "skills": r.skills, "node_id": r.node_id}
    _emit(args, d, json.dumps(d, indent=2, default=str))
    return 0


def cmd_prompt_create(ctx, args) -> int:
    if ctx.remote:
        sections = json.loads(args.sections) if args.sections else {}
        d = ctx.http("POST", "/prompts", body={
            "slug": args.slug, "type": args.type,
            "branch": args.branch, "sections": sections})
        _emit(args, d, f"created prompt {args.slug}@{args.branch}")
        return 0
    cx = ctx.cortex()
    sections = json.loads(args.sections) if args.sections else {}
    content = PromptContent(slug=args.slug, prompt_type=args.type,
                            branch=args.branch, sections=sections)
    node_id = cx.prompts.create_prompt(content, branch=args.branch)
    cx._on_write()
    _emit(args, {"node_id": node_id},
          f"created prompt {args.slug}@{args.branch} ({node_id[:13]}…)")
    return 0


def cmd_prompt_migrate(ctx, args) -> int:
    """Import a prompt-migration JSON file (reference cli/prompt.rs:493):
    {prompts: [{slug, type, name, metadata}], versions: [{slug, branch,
    version, content}], inheritance: [{child, parent}]}. Existing
    (slug, branch, version) entries are skipped; --dry-run previews."""
    with open(args.file) as f:
        migration = json.load(f)
    prompts = migration.get("prompts", [])
    versions = migration.get("versions", [])
    inheritance = migration.get("inheritance", [])
    if args.dry_run:
        _emit(args, {"prompts": len(prompts), "versions": len(versions),
                     "inheritance": len(inheritance), "dry_run": True},
              f"dry run: {len(prompts)} prompts, {len(versions)} "
              f"versions, {len(inheritance)} inheritance links")
        return 0

    cx = ctx.cortex()
    meta_by_slug = {p.get("slug"): p for p in prompts}
    groups = {}
    for v in versions:
        groups.setdefault((v.get("slug", ""), v.get("branch", "main")),
                          []).append(v)
    created = skipped = 0
    for (slug, branch) in sorted(groups):
        ordered = sorted(groups[(slug, branch)],
                         key=lambda v: int(v.get("version", 1)))
        for ordinal, mv in enumerate(ordered, start=1):
            version = int(mv.get("version", 1))
            # idempotency keys on the ORDINAL, not the file's version
            # number: the resolver assigns its own sequential versions
            # (create_version always uses head+1), so a file with
            # versions [2, 3] stores v1, v2 — re-running must skip the
            # i-th file entry when stored version i exists, or
            # non-contiguous files import duplicates forever
            if cx.prompts.get_version(slug, branch, ordinal) is not None:
                skipped += 1
                continue
            raw = dict(mv.get("content", {}))
            meta = meta_by_slug.get(slug, {})
            metadata = {**meta.get("metadata", {}),
                        **raw.get("metadata", {})}
            if meta.get("name"):
                metadata.setdefault("name", meta["name"])
            content = PromptContent(
                slug=slug,
                prompt_type=raw.get("type", raw.get(
                    "prompt_type", meta.get("type", "unknown"))),
                branch=branch, version=version,
                sections=dict(raw.get("sections", {})),
                metadata=metadata,
                override_sections=dict(raw.get("override_sections", {})),
                context_weights=raw.get("context_weights"))
            if cx.prompts.find_head(slug, branch) is None:
                cx.prompts.create_prompt(content, branch=branch)
            else:
                cx.prompts.create_version(slug, branch, content)
            created += 1
    linked = 0
    from ..errors import DuplicateEdge
    for link in inheritance:
        child = cx.prompts.find_head(link.get("child", ""), "main")
        parent = cx.prompts.find_head(link.get("parent", ""), "main")
        if child is None or parent is None:
            continue
        try:
            cx.create_edge(Edge.new(child.id, parent.id, "inherits_from",
                                    1.0, EdgeProvenance.imported(
                                        "prompt-migrate")))
            linked += 1
        except DuplicateEdge:
            pass
    cx._on_write()
    _emit(args, {"created": created, "skipped": skipped,
                 "inheritance_links": linked},
          f"migrated {created} versions ({skipped} skipped, "
          f"{linked} inheritance links)")
    return 0


def cmd_prompt_performance(ctx, args) -> int:
    """Aggregate observation scores for a prompt's versions
    (http prompts.rs performance endpoint behavior)."""
    if ctx.remote:
        d = ctx.http("GET", f"/prompts/{args.slug}/performance")
        _emit(args, d, json.dumps(d, indent=2, default=str))
        return 0
    cx = ctx.cortex()
    versions = cx.prompts.find_versions(args.slug, args.branch)
    if not versions:
        _err(f"prompt '{args.slug}' not found")
    rows = []
    for v in versions:
        obs_scores = []
        for e in cx.storage.edges_to(v.id):
            if e.relation != "observed_with":
                continue
            o = cx.get_node(e.from_id)
            if o is not None and "observation_score" in o.metadata:
                obs_scores.append(float(o.metadata["observation_score"]))
        c = PromptContent.try_from_node(v)
        rows.append({
            "version": c.version if c else None,
            "node_id": v.id,
            "observations": len(obs_scores),
            "mean_score": (sum(obs_scores) / len(obs_scores))
            if obs_scores else None})
    _emit(args, rows, "\n".join(
        f"v{r['version']}: n={r['observations']} mean="
        f"{r['mean_score'] if r['mean_score'] is None else round(r['mean_score'], 3)}"
        for r in rows))
    return 0


def cmd_prompt_deploy(ctx, args) -> int:
    if ctx.remote:
        d = ctx.http("POST", f"/prompts/{args.slug}/deploy", body={
            "branch": args.branch, "agent_name": args.agent or "system"})
        _emit(args, d, f"deployed {args.slug}@{args.branch} "
              f"v{d.get('version', '?')}")
        return 0
    cx = ctx.cortex()
    head = cx.prompts.find_head(args.slug, args.branch)
    if head is None:
        _err(f"prompt '{args.slug}' not found")
    c = PromptContent.try_from_node(head)
    dep_id = cx.rollback_monitor.record_deployment(
        args.slug, args.branch, c.version if c else 1, head.id,
        agent_name=args.agent)
    _emit(args, {"deployment": dep_id, "prompt": head.id},
          f"deployed {args.slug}@{args.branch} "
          f"v{c.version if c else '?'} (deployment {str(dep_id)[:13]}…)")
    return 0


def cmd_prompt_rollback_status(ctx, args) -> int:
    if ctx.remote:
        d = ctx.http("GET", f"/prompts/{args.slug}/rollback-status",
                     params={"branch": args.branch})
        _emit(args, d, json.dumps(d, indent=2, default=str))
        return 0
    cx = ctx.cortex()
    st = cx.rollback_monitor.get_status(args.slug, args.branch)
    if st is None:
        _emit(args, {"active": False},
              f"no active deployment for {args.slug}@{args.branch}")
        return 0
    from dataclasses import asdict
    d = asdict(st)
    _emit(args, d, json.dumps(d, indent=2, default=str))
    return 0


def cmd_prompt_unquarantine(ctx, args) -> int:
    if ctx.remote:
        d = ctx.http("POST", f"/prompts/{args.slug}/unquarantine",
                     body={"branch": args.branch})
        _emit(args, d, f"unquarantined {args.slug}@{args.branch}")
        return 0
    cx = ctx.cortex()
    head = cx.prompts.find_head(args.slug, args.branch)
    if head is None:
        _err(f"prompt '{args.slug}' not found")
    cx.rollback_monitor.unquarantine(head.id)
    _emit(args, {"unquarantined": head.id},
          f"unquarantined {args.slug}@{args.branch}")
    return 0


# ------------------------------------------------------------ registration


def register_agent_prompt_commands(sub) -> None:
    agent = sub.add_parser("agent", help="agent-prompt binding & selection")
    asub = agent.add_subparsers(dest="agent_cmd", required=True)
    asub.add_parser("list").set_defaults(fn=cmd_agent_list)
    sp = asub.add_parser("show")
    sp.add_argument("name")
    sp.set_defaults(fn=cmd_agent_show)
    sp = asub.add_parser("bind")
    sp.add_argument("name")
    sp.add_argument("slug")
    sp.add_argument("--branch", default="main")
    sp.set_defaults(fn=cmd_agent_bind)
    sp = asub.add_parser("unbind")
    sp.add_argument("name")
    sp.add_argument("slug")
    sp.set_defaults(fn=cmd_agent_unbind)
    sp = asub.add_parser("resolve")
    sp.add_argument("name")
    sp.set_defaults(fn=cmd_agent_resolve)
    sp = asub.add_parser("select")
    sp.add_argument("name")
    sp.add_argument("--sentiment", type=float, default=0.5)
    sp.add_argument("--task-type", default="casual")
    sp.add_argument("--correction-rate", type=float, default=0.0)
    sp.add_argument("--epsilon", type=float, default=0.0)
    sp.set_defaults(fn=cmd_agent_select)
    sp = asub.add_parser("history")
    sp.add_argument("name")
    sp.add_argument("--limit", type=int, default=20)
    sp.set_defaults(fn=cmd_agent_history)
    sp = asub.add_parser("observe")
    sp.add_argument("name")
    sp.add_argument("variant_id")
    sp.add_argument("--sentiment", type=float, default=0.5)
    sp.add_argument("--corrections", type=int, default=0)
    sp.add_argument("--outcome", default="unknown",
                    choices=["success", "partial", "failure", "unknown"])
    sp.set_defaults(fn=cmd_agent_observe)

    prompt = sub.add_parser("prompt", help="prompt versioning & rollout")
    psub = prompt.add_subparsers(dest="prompt_cmd", required=True)
    psub.add_parser("list").set_defaults(fn=cmd_prompt_list)
    sp = psub.add_parser("get")
    sp.add_argument("slug")
    sp.add_argument("--branch", default="main")
    sp.set_defaults(fn=cmd_prompt_get)
    sp = psub.add_parser("create")
    sp.add_argument("slug")
    sp.add_argument("--type", default="persona")
    sp.add_argument("--branch", default="main")
    sp.add_argument("--sections", help="JSON object of sections")
    sp.set_defaults(fn=cmd_prompt_create)
    sp = psub.add_parser("migrate")
    sp.add_argument("file")
    sp.add_argument("--dry-run", action="store_true")
    sp.set_defaults(fn=cmd_prompt_migrate)
    sp = psub.add_parser("performance")
    sp.add_argument("slug")
    sp.add_argument("--branch", default="main")
    sp.set_defaults(fn=cmd_prompt_performance)
    sp = psub.add_parser("deploy")
    sp.add_argument("slug")
    sp.add_argument("--branch", default="main")
    sp.add_argument("--agent", default="cli")
    sp.set_defaults(fn=cmd_prompt_deploy)
    sp = psub.add_parser("rollback-status")
    sp.add_argument("slug")
    sp.add_argument("--branch", default="main")
    sp.set_defaults(fn=cmd_prompt_rollback_status)
    sp = psub.add_parser("unquarantine")
    sp.add_argument("slug")
    sp.add_argument("--branch", default="main")
    sp.set_defaults(fn=cmd_prompt_unquarantine)
