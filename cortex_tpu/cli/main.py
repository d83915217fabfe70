"""`cortex` CLI — 21 command families.

Parity: cortex-server/src/main.rs:41-142 + cli/mod.rs:54-294. Commands:
serve, init, shell, node {create,get,list,delete,stats}, edge
{create,list}, search, traverse, path, briefing, import, export,
backup, restore, migrate, stats, doctor, config {validate,show},
audit, security generate-key, mcp, agent {...}, prompt {...}.

The reference CLI talks gRPC to a running server (cli/mod.rs:589);
here commands run against the embedded engine on `--data-dir` by
default (library mode), or against a running server over HTTP with
`--server URL` for the query/mutation commands — HTTP is this
framework's canonical remote wire for tooling.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Any, List, Optional

from ..config import CortexConfig
from ..errors import CortexError
from ..graph import BOTH, INCOMING, OUTGOING, PathRequest, TraversalRequest
from ..storage.base import NodeFilter
from ..types import Edge, EdgeProvenance, Node, Source

DB_FILENAME = "cortex.db"


class CliError(Exception):
    pass


# ---------------------------------------------------------------------------
# context: embedded engine or HTTP remote
# ---------------------------------------------------------------------------


class CliContext:
    def __init__(self, args):
        self.args = args
        self.config = CortexConfig.load_or_default(args.config)
        if args.data_dir:
            self.config.server.data_dir = args.data_dir
        self._cortex = None

    @property
    def remote(self) -> Optional[str]:
        return self.args.server

    def cortex(self):
        if self.remote:
            raise CliError("this command runs on the local store; "
                           "drop --server")
        if self._cortex is None:
            from ..api import open_embedded
            # honors security.encryption_at_rest like the server does
            self._cortex, self._guard = open_embedded(self.config)
        return self._cortex

    def close(self):
        try:
            if self._cortex is not None:
                self._cortex.close()
        finally:
            if getattr(self, "_guard", None) is not None:
                self._guard.close()   # re-encrypt at rest, always

    # ------------------------------------------------------------- remote
    def http(self, method: str, path: str, *, params=None,
             body=None, headers=None) -> Any:
        import urllib.error
        import urllib.parse
        import urllib.request
        url = self.remote.rstrip("/") + path
        if params:
            url += "?" + urllib.parse.urlencode(
                {k: v for k, v in params.items() if v is not None})
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(url, data=data, method=method)
        req.add_header("content-type", "application/json")
        for k, v in (headers or {}).items():
            req.add_header(k, v)
        token = os.environ.get("CORTEX_AUTH_TOKEN") \
            or self.config.security.auth_token
        if token:
            req.add_header("authorization", f"Bearer {token}")
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                payload = json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            try:
                payload = json.loads(e.read().decode())
            except Exception:
                raise CliError(f"server error {e.code}") from e
            raise CliError(payload.get("error", f"server error {e.code}"))
        except urllib.error.URLError as e:
            raise CliError(f"cannot reach server {self.remote}: {e.reason}")
        if not payload.get("ok", False):
            raise CliError(payload.get("error", "request failed"))
        return payload.get("data")


def emit(args, data: Any, human: Optional[str] = None) -> None:
    if args.json or human is None:
        print(json.dumps(data, indent=2, default=str))
    else:
        print(human)


def node_brief(d: dict) -> str:
    data = d.get("data", d)
    title = data.get("title", d.get("title", ""))
    return (f"{d['id'][:13]}…  [{d['kind']:<11}] imp={d['importance']:.2f}  "
            f"{title[:70]}")


def node_to_wire(n: Node) -> dict:
    d = n.to_dict()
    d.pop("embedding", None)
    return d


# ---------------------------------------------------------------------------
# command implementations
# ---------------------------------------------------------------------------


def cmd_serve(ctx: CliContext, args) -> int:
    from ..server.serve import run
    if args.grpc_addr:
        ctx.config.server.grpc_addr = args.grpc_addr
    if args.http_addr:
        ctx.config.server.http_addr = args.http_addr
    run(ctx.config)
    return 0


def cmd_init(ctx: CliContext, args) -> int:
    """Create the data dir + empty store + example config
    (cli/mod.rs Init)."""
    data_dir = ctx.config.server.data_dir
    os.makedirs(data_dir, exist_ok=True)
    cx = ctx.cortex()   # creates the db with schema
    cfg_path = args.write_config or os.path.join(data_dir, "cortex.toml")
    if not os.path.exists(cfg_path):
        with open(cfg_path, "w") as f:
            f.write(EXAMPLE_CONFIG)
    emit(args, {"data_dir": data_dir, "config": cfg_path,
                "nodes": cx.stats().node_count},
         f"initialized cortex store at {data_dir} (config: {cfg_path})")
    return 0


def cmd_node_create(ctx: CliContext, args) -> int:
    if ctx.remote:
        body = {"kind": args.kind, "title": args.title,
                "body": args.body or args.title,
                "importance": args.importance,
                "agent": args.agent,
                "tags": args.tag or []}
        # the server's bypass requires BOTH ?gate=skip and the
        # override header; --agent rides x-agent-id like the SDKs
        d = ctx.http("POST", "/nodes", body=body,
                     params={"gate": "skip"} if args.no_gate else None,
                     headers={
                         **({"x-agent-id": args.agent}
                            if args.agent else {}),
                         **({"x-gate-override": "true"}
                            if args.no_gate else {})})
        emit(args, d, f"created {d['id']}")
        return 0
    n = Node.new(args.kind, args.title, args.body or args.title,
                 Source(agent=args.agent), args.importance)
    n.tags = args.tag or []
    ctx.cortex().store(n, gate=not args.no_gate)
    emit(args, node_to_wire(n), f"created {n.id}")
    return 0


def cmd_node_get(ctx: CliContext, args) -> int:
    if ctx.remote:
        d = ctx.http("GET", f"/nodes/{args.id}")
    else:
        n = ctx.cortex().get_node(args.id)
        if n is None:
            raise CliError(f"node {args.id} not found")
        d = node_to_wire(n)
    emit(args, d, json.dumps(d, indent=2, default=str))
    return 0


def cmd_node_list(ctx: CliContext, args) -> int:
    if ctx.remote:
        rows = ctx.http("GET", "/nodes", params={
            "kind": args.kind, "agent": args.agent, "limit": args.limit,
            "tags": ",".join(args.tag) if args.tag else None})
    else:
        f = NodeFilter(kinds=[args.kind] if args.kind else None,
                       source_agent=args.agent, limit=args.limit,
                       tags=args.tag or None)
        rows = [node_to_wire(n) for n in ctx.cortex().list_nodes(f)]
    emit(args, rows, "\n".join(node_brief(r) for r in rows)
         or "(no nodes)")
    return 0


def cmd_node_delete(ctx: CliContext, args) -> int:
    if ctx.remote:
        ctx.http("DELETE", f"/nodes/{args.id}",
                 params={"hard": "true"} if args.hard else None)
        ok = True
    else:
        ok = ctx.cortex().delete_node(args.id, hard=args.hard)
    if not ok:
        raise CliError(f"node {args.id} not found")
    emit(args, {"deleted": args.id, "hard": args.hard},
         f"deleted {args.id}{' (hard)' if args.hard else ''}")
    return 0


def cmd_stats(ctx: CliContext, args) -> int:
    if ctx.remote:
        d = ctx.http("GET", "/stats")
    else:
        cx = ctx.cortex()
        s = cx.stats()
        d = {"node_count": s.node_count, "edge_count": s.edge_count,
             "deleted_node_count": s.deleted_node_count,
             "nodes_by_kind": s.nodes_by_kind,
             "edges_by_relation": s.edges_by_relation,
             "db_size_bytes": s.db_size_bytes,
             "index": cx.index.index_info()}
    lines = [f"nodes: {d['node_count']}  edges: {d['edge_count']}  "
             f"deleted: {d.get('deleted_node_count', 0)}  "
             f"db: {d.get('db_size_bytes', 0)/1024:.1f}KiB"]
    for k, v in sorted(d.get("nodes_by_kind", {}).items()):
        lines.append(f"  {k:<14} {v}")
    ix = d.get("index")
    if ix:
        extra = (f" nlist={ix['nlist']} nprobe={ix['nprobe']}"
                 f"{' (tuned)' if ix.get('nprobe_tuned') else ''}"
                 if ix.get("trained") else "")
        lines.append(f"index: {ix['kind']} size={ix['size']} "
                     f"path={ix.get('resolved_path', '?')}{extra}")
    emit(args, d, "\n".join(lines))
    return 0


def cmd_edge_create(ctx: CliContext, args) -> int:
    if ctx.remote:
        d = ctx.http("POST", "/edges", body={
            "from": args.from_id, "to": args.to_id,
            "relation": args.relation, "weight": args.weight})
        emit(args, d, f"created edge {d['id']}")
        return 0
    e = Edge.new(args.from_id, args.to_id, args.relation, args.weight,
                 EdgeProvenance.manual(args.agent))
    ctx.cortex().create_edge(e)
    emit(args, e.to_dict(), f"created edge {e.id}")
    return 0


def cmd_edge_list(ctx: CliContext, args) -> int:
    cx = ctx.cortex()
    edges = cx.storage.edges_from(args.node) + cx.storage.edges_to(args.node)
    seen, rows = set(), []
    for e in edges:
        if e.id in seen:
            continue
        seen.add(e.id)
        rows.append(e.to_dict())
    emit(args, rows, "\n".join(
        f"{r['id'][:13]}…  {r['from']} -[{r['relation']} "
        f"w={r['weight']:.2f}]-> {r['to']}" for r in rows) or "(no edges)")
    return 0


def cmd_search(ctx: CliContext, args) -> int:
    if ctx.remote:
        rows = ctx.http("GET", "/search", params={
            "q": args.query, "limit": args.limit,
            "decay": "false" if args.no_decay else None})
        human = "\n".join(f"{r['score']:.4f}  {node_brief(r['node'])}"
                          for r in rows)
    else:
        hits = ctx.cortex().search(args.query, args.limit,
                                   decay=not args.no_decay)
        rows = [{"score": s, "node": node_to_wire(n)} for s, n in hits]
        human = "\n".join(f"{s:.4f}  {node_brief(node_to_wire(n))}"
                          for s, n in hits)
    emit(args, rows, human or "(no results)")
    return 0


def cmd_traverse(ctx: CliContext, args) -> int:
    direction = {"out": OUTGOING, "in": INCOMING, "both": BOTH}[args.direction]
    sub = ctx.cortex().traverse(TraversalRequest(
        start=[args.start], max_depth=args.depth, direction=direction,
        relation_filter=args.relation or None, limit=args.limit))
    d = {"nodes": [node_to_wire(n) for n in sub.nodes.values()],
         "edges": [e.to_dict() for e in sub.edges],
         "visited": sub.visited_count, "truncated": sub.truncated}
    human = "\n".join(
        f"depth={sub.depths.get(n.id, '?')}  {node_brief(node_to_wire(n))}"
        for n in sorted(sub.nodes.values(),
                        key=lambda n: sub.depths.get(n.id, 0)))
    emit(args, d, human or "(empty)")
    return 0


def cmd_path(ctx: CliContext, args) -> int:
    paths = ctx.cortex().find_paths(PathRequest(
        from_id=args.from_id, to_id=args.to_id,
        max_length=args.max_length, max_paths=args.k)).paths
    d = [{"nodes": p.nodes, "weight": p.total_weight} for p in paths]
    emit(args, d, "\n".join(
        f"w={p.total_weight:.3f}  " + " -> ".join(p.nodes)
        for p in paths) or "(no path)")
    return 0


def cmd_briefing(ctx: CliContext, args) -> int:
    if ctx.remote:
        d = ctx.http("GET", f"/briefing/{args.agent_id}",
                     params={"format": "json",
                             "compact": "true" if args.compact else None})
        text = d.get("text", "") if isinstance(d, dict) else str(d)
    else:
        text = ctx.cortex().briefing(args.agent_id, compact=args.compact)
    print(text)
    return 0


def cmd_query(ctx: CliContext, args) -> int:
    rows = [node_to_wire(n) for n in ctx.cortex().query(args.dsl)]
    emit(args, rows, "\n".join(node_brief(r) for r in rows) or "(no nodes)")
    return 0


def cmd_audit(ctx: CliContext, args) -> int:
    entries = ctx.cortex().audit.query(
        action=args.action, target_id=args.target, limit=args.limit)
    rows = [{"ts": e.ts, "action": e.action, "target": e.target_id,
             "actor": e.actor, "details": e.details} for e in entries]
    emit(args, rows, "\n".join(
        f"{time.strftime('%Y-%m-%d %H:%M:%S', time.localtime(r['ts']))}  "
        f"{r['action']:<18} {r['target'][:13]}…  by {r['actor']}"
        for r in rows) or "(no audit entries)")
    return 0


def cmd_config_validate(ctx: CliContext, args) -> int:
    ctx.config.validate()
    emit(args, {"valid": True}, "config OK")
    return 0


def cmd_config_show(ctx: CliContext, args) -> int:
    from dataclasses import asdict
    print(json.dumps(asdict(ctx.config), indent=2, default=str))
    return 0


def cmd_security_generate_key(ctx: CliContext, args) -> int:
    from ..storage.encrypted import generate_key
    print(generate_key())
    return 0


def cmd_mcp(ctx: CliContext, args) -> int:
    from ..server.mcp import run_stdio
    run_stdio(ctx.config, remote=args.server,
              data_dir=ctx.config.server.data_dir)
    return 0


def cmd_auto_link(ctx: CliContext, args) -> int:
    if ctx.remote:
        d = ctx.http("POST", "/auto-linker/trigger")
    else:
        m = ctx.cortex().run_linker_cycle()
        d = {"nodes_processed": m.nodes_processed,
             "edges_created": m.edges_created,
             "summary": m.summary()}
    emit(args, d, d.get("summary", json.dumps(d)))
    return 0


EXAMPLE_CONFIG = """\
# cortex.toml — see docs for all blocks
[server]
grpc_addr = "0.0.0.0:9090"
http_addr = "0.0.0.0:9091"
# "." = this directory (the config sits inside the data dir it
# describes, so `cortex serve` run here finds the same store init made)
data_dir = "."

[embedding]
model = "hash"          # deterministic hashing embedder; or a model name
dimension = 384

[auto_linker]
enabled = true
interval_secs = 60
"""


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cortex", description="cortex_tpu — TPU-native graph memory "
        "engine for AI agents")
    p.add_argument("--config", default="cortex.toml",
                   help="path to cortex.toml (default: ./cortex.toml when "
                        "present — cli/mod.rs:27-32 default_value)")
    p.add_argument("--data-dir", help="override data directory")
    p.add_argument("--server",
                   help="remote server base URL (http://host:9091)")
    p.add_argument("--json", action="store_true",
                   help="machine-readable JSON output")
    sub = p.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("serve", help="run the server")
    sp.add_argument("--grpc-addr")
    sp.add_argument("--http-addr")
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser("init", help="initialize a data directory")
    sp.add_argument("--write-config")
    sp.set_defaults(fn=cmd_init)

    sp = sub.add_parser("shell", help="interactive REPL")
    sp.set_defaults(fn=None, _shell=True)

    node = sub.add_parser("node", help="node operations")
    nsub = node.add_subparsers(dest="node_cmd", required=True)
    sp = nsub.add_parser("create")
    sp.add_argument("kind")
    sp.add_argument("title")
    sp.add_argument("body", nargs="?")
    sp.add_argument("--importance", type=float, default=0.5)
    sp.add_argument("--tag", action="append")
    sp.add_argument("--agent", default="cli")
    sp.add_argument("--no-gate", action="store_true")
    sp.set_defaults(fn=cmd_node_create)
    sp = nsub.add_parser("get")
    sp.add_argument("id")
    sp.set_defaults(fn=cmd_node_get)
    sp = nsub.add_parser("list")
    sp.add_argument("--kind")
    sp.add_argument("--agent")
    sp.add_argument("--tag", action="append")
    sp.add_argument("--limit", type=int, default=50)
    sp.set_defaults(fn=cmd_node_list)
    sp = nsub.add_parser("delete")
    sp.add_argument("id")
    sp.add_argument("--hard", action="store_true")
    sp.set_defaults(fn=cmd_node_delete)
    sp = nsub.add_parser("stats")
    sp.set_defaults(fn=cmd_stats)

    edge = sub.add_parser("edge", help="edge operations")
    esub = edge.add_subparsers(dest="edge_cmd", required=True)
    sp = esub.add_parser("create")
    sp.add_argument("from_id")
    sp.add_argument("to_id")
    sp.add_argument("relation")
    sp.add_argument("--weight", type=float, default=0.5)
    sp.add_argument("--agent", default="cli")
    sp.set_defaults(fn=cmd_edge_create)
    sp = esub.add_parser("list")
    sp.add_argument("node")
    sp.set_defaults(fn=cmd_edge_list)

    sp = sub.add_parser("search", help="semantic search")
    sp.add_argument("query")
    sp.add_argument("--limit", type=int, default=10)
    sp.add_argument("--no-decay", action="store_true")
    sp.set_defaults(fn=cmd_search)

    sp = sub.add_parser("traverse", help="graph traversal")
    sp.add_argument("start")
    sp.add_argument("--depth", type=int, default=3)
    sp.add_argument("--direction", choices=["out", "in", "both"],
                    default="out")
    sp.add_argument("--relation", action="append")
    sp.add_argument("--limit", type=int)
    sp.set_defaults(fn=cmd_traverse)

    sp = sub.add_parser("path", help="find paths between nodes")
    sp.add_argument("from_id")
    sp.add_argument("to_id")
    sp.add_argument("--max-length", type=int)
    sp.add_argument("-k", type=int, default=1, dest="k")
    sp.set_defaults(fn=cmd_path)

    sp = sub.add_parser("briefing", help="agent briefing")
    sp.add_argument("agent_id")
    sp.add_argument("--compact", action="store_true")
    sp.set_defaults(fn=cmd_briefing)

    sp = sub.add_parser("query", help="query-DSL node listing")
    sp.add_argument("dsl")
    sp.set_defaults(fn=cmd_query)

    sp = sub.add_parser("stats", help="store statistics")
    sp.set_defaults(fn=cmd_stats)

    sp = sub.add_parser("audit", help="audit log")
    sp.add_argument("--action")
    sp.add_argument("--target")
    sp.add_argument("--limit", type=int, default=50)
    sp.set_defaults(fn=cmd_audit)

    sp = sub.add_parser("auto-link", help="run one auto-linker cycle")
    sp.set_defaults(fn=cmd_auto_link)

    cfg = sub.add_parser("config", help="config tools")
    csub = cfg.add_subparsers(dest="config_cmd", required=True)
    csub.add_parser("validate").set_defaults(fn=cmd_config_validate)
    csub.add_parser("show").set_defaults(fn=cmd_config_show)

    sec = sub.add_parser("security", help="security tools")
    ssub = sec.add_subparsers(dest="security_cmd", required=True)
    ssub.add_parser("generate-key").set_defaults(
        fn=cmd_security_generate_key)

    sp = sub.add_parser("mcp", help="MCP stdio server")
    sp.set_defaults(fn=cmd_mcp)

    from .data import register_data_commands
    register_data_commands(sub)
    from .agent_prompt import register_agent_prompt_commands
    register_agent_prompt_commands(sub)
    return p


def main(argv: Optional[List[str]] = None, *,
         reuse_ctx: Optional["CliContext"] = None) -> int:
    """reuse_ctx: the shell passes its long-lived context so each REPL
    line doesn't pay a full engine open (embedder init, index load,
    encryption decrypt) AND a close-time re-encrypt."""
    parser = build_parser()
    args = parser.parse_args(argv)
    if getattr(args, "_shell", False):
        from .shell import run_shell
        return run_shell(args)
    ctx = reuse_ctx if reuse_ctx is not None else CliContext(args)
    try:
        return args.fn(ctx, args)
    except (CliError, CortexError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    finally:
        if reuse_ctx is None:
            ctx.close()
