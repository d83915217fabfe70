"""gRPC surface.

Service parity: cortex-server/src/grpc/service.rs:27-910 — the 19
CortexService RPCs over the embedded Cortex, with bearer-token
interceptor auth (serve.rs:316-332). Built with grpc generic handlers
(no codegen plugin needed): cortex_pb2 supplies messages; this module
supplies the method table for server and client alike.
"""

from __future__ import annotations

import asyncio
import json
from concurrent import futures
from typing import Optional

import grpc

from ..errors import (CortexError, DuplicateEdge, GateRejection, InvalidEdge,
                      NodeNotFound, ValidationError)
from ..graph.types import PathRequest, TraversalRequest, BOTH
from ..storage.base import NodeFilter
from ..query import parse_and_compile
from ..vector.shard import DeviceFetchTimeout
from ..types import Edge, Node, Source
from . import cortex_pb2 as pb
from .batcher import BatcherClosed
from .conversions import (edge_to_pb, node_to_pb, parse_direction,
                          parse_strategy, paths_to_pb,
                          provenance_from_pb, subgraph_to_pb)
from .state import ServerState

SERVICE = "cortex.v1.CortexService"

#: RPC name -> (request class, response class)
METHODS = {
    "CreateNode": (pb.CreateNodeRequest, pb.NodeResponse),
    "GetNode": (pb.GetNodeRequest, pb.NodeResponse),
    "UpdateNode": (pb.UpdateNodeRequest, pb.NodeResponse),
    "DeleteNode": (pb.DeleteNodeRequest, pb.DeleteResponse),
    "ListNodes": (pb.ListNodesRequest, pb.ListNodesResponse),
    "CreateEdge": (pb.CreateEdgeRequest, pb.EdgeResponse),
    "GetEdges": (pb.GetEdgesRequest, pb.GetEdgesResponse),
    "DeleteEdge": (pb.DeleteEdgeRequest, pb.DeleteResponse),
    "Traverse": (pb.TraverseRequest, pb.SubgraphResponse),
    "FindPaths": (pb.FindPathsRequest, pb.PathsResponse),
    "Neighborhood": (pb.NeighborhoodRequest, pb.SubgraphResponse),
    "SimilaritySearch": (pb.SimilaritySearchRequest, pb.SearchResponse),
    "HybridSearch": (pb.HybridSearchRequest, pb.HybridSearchResponse),
    "GetBriefing": (pb.BriefingRequest, pb.BriefingResponse),
    "Stats": (pb.StatsRequest, pb.StatsResponse),
    "AutoLinkerStatus": (pb.AutoLinkerStatusRequest,
                         pb.AutoLinkerStatusResponse),
    "TriggerAutoLink": (pb.TriggerAutoLinkRequest,
                        pb.TriggerAutoLinkResponse),
    "Reindex": (pb.ReindexRequest, pb.ReindexResponse),
    "Health": (pb.HealthRequest, pb.HealthResponse),
}


class CortexServiceImpl:
    def __init__(self, state: ServerState):
        self.state = state
        self.cx = state.cortex

    # ------------------------------------------------------------- nodes
    def CreateNode(self, req, ctx):
        n = Node.new(req.kind or "fact", req.title, req.body,
                     Source(agent=req.source_agent or "grpc",
                            session=req.source_session or None,
                            channel=req.source_channel or None),
                     req.importance if req.HasField("importance") else 0.5)
        n.tags = list(req.tags)
        if req.metadata_json:
            n.metadata = json.loads(req.metadata_json)
        self.cx.store(n, gate=not req.skip_gate,
                      actor=n.source.agent)
        return pb.NodeResponse(node=node_to_pb(n))

    def GetNode(self, req, ctx):
        n = self.cx.get_node(req.id)
        if n is None:
            ctx.abort(grpc.StatusCode.NOT_FOUND, f"node {req.id} not found")
        return pb.NodeResponse(node=node_to_pb(n))

    def UpdateNode(self, req, ctx):
        n = self.cx.get_node(req.id)
        if n is None:
            ctx.abort(grpc.StatusCode.NOT_FOUND, f"node {req.id} not found")
        if req.HasField("title"):
            n.title = req.title
        if req.HasField("body"):
            n.body = req.body
        if req.HasField("kind"):
            n.kind = req.kind
        if req.HasField("metadata_json"):
            n.metadata = json.loads(req.metadata_json)
        if req.replace_tags:
            n.tags = list(req.tags)
        if req.HasField("importance"):
            n.importance = req.importance
        self.cx.update_node(n)          # re-embeds (service.rs:170+)
        return pb.NodeResponse(node=node_to_pb(n))

    def DeleteNode(self, req, ctx):
        ok = self.cx.delete_node(req.id, hard=req.hard)
        return pb.DeleteResponse(deleted=ok)

    def ListNodes(self, req, ctx):
        if req.query_dsl:
            flt = parse_and_compile(req.query_dsl)
        else:
            flt = NodeFilter(
                kinds=list(req.kinds) or None,
                tags=list(req.tags) or None,
                source_agent=req.source_agent or None,
                created_after=req.created_after
                if req.HasField("created_after") else None,
                created_before=req.created_before
                if req.HasField("created_before") else None,
                min_importance=req.min_importance
                if req.HasField("min_importance") else None,
                include_deleted=req.include_deleted,
                limit=req.limit or None, offset=req.offset)
        nodes = self.cx.list_nodes(flt)
        return pb.ListNodesResponse(nodes=[node_to_pb(n) for n in nodes])

    # ------------------------------------------------------------- edges
    def CreateEdge(self, req, ctx):
        e = Edge.new(req.from_id, req.to_id, req.relation or "related_to",
                     req.weight if req.HasField("weight") else 1.0,
                     provenance_from_pb("manual", req.created_by or "grpc",
                                        0.0))
        self.cx.create_edge(e)
        return pb.EdgeResponse(edge=edge_to_pb(e))

    def GetEdges(self, req, ctx):
        if req.direction == "outgoing":
            edges = self.cx.storage.edges_from(req.node_id)
        elif req.direction == "incoming":
            edges = self.cx.storage.edges_to(req.node_id)
        else:
            edges = (self.cx.storage.edges_from(req.node_id)
                     + self.cx.storage.edges_to(req.node_id))
        return pb.GetEdgesResponse(edges=[edge_to_pb(e) for e in edges])

    def DeleteEdge(self, req, ctx):
        return pb.DeleteResponse(deleted=self.cx.delete_edge(req.id))

    # ------------------------------------------------------------- graph
    def Traverse(self, req, ctx):
        sub = self.cx.traverse(TraversalRequest(
            start=list(req.start),
            max_depth=req.max_depth if req.HasField("max_depth") else None,
            direction=parse_direction(req.direction),
            relation_filter=list(req.relation_filter) or None,
            kind_filter=list(req.kind_filter) or None,
            min_weight=req.min_weight
            if req.HasField("min_weight") else None,
            limit=req.limit if req.HasField("limit") else None,
            strategy=parse_strategy(req.strategy),
            include_start=req.include_start))
        return subgraph_to_pb(sub)

    def FindPaths(self, req, ctx):
        res = self.cx.find_paths(PathRequest(
            from_id=req.from_id, to_id=req.to_id,
            max_length=req.max_length
            if req.HasField("max_length") else None,
            relation_filter=list(req.relation_filter) or None,
            min_weight=req.min_weight
            if req.HasField("min_weight") else None,
            max_paths=req.max_paths or 1))
        return paths_to_pb(res.paths)

    def Neighborhood(self, req, ctx):
        sub = self.cx.neighborhood(req.node_id, depth=req.depth or 1)
        return subgraph_to_pb(sub)

    # ------------------------------------------------------------- search
    def SimilaritySearch(self, req, ctx):
        from ..vector import VectorFilter
        flt = VectorFilter(kinds=list(req.kind_filter) or None) \
            if req.kind_filter else None
        limit = req.limit or 10
        decay = not req.skip_decay
        rb = (req.recency_bias if req.HasField("recency_bias") else None)
        batcher = getattr(self.state, "search_batcher", None)
        loop = getattr(self.state, "loop", None)
        hits = None
        if batcher is not None and loop is not None and loop.is_running():
            # gRPC handlers run on a thread pool; hop onto the server's
            # event loop so concurrent gRPC and HTTP searches coalesce
            # into the same shared device dispatches. Bounded wait: if
            # the loop stops between the is_running() check and the
            # coroutine executing (shutdown race), the future would
            # never resolve and .result() would pin this worker thread
            # forever — time out and serve via the direct path instead.
            try:
                raw = asyncio.run_coroutine_threadsafe(
                    batcher.search(req.query,
                                   self.cx.overfetch_k(limit, decay), flt),
                    loop).result(timeout=120.0)
                hits = self.cx.finish_search(raw, limit, decay=decay,
                                             recency_bias=rb)
            except futures.TimeoutError:   # alias of TimeoutError on
                hits = None                # 3.11+, distinct on 3.10
            except BatcherClosed:
                # a request racing shutdown — the direct path below
                # still works (ADVICE r2 #3). ONLY this case falls
                # back: DeviceFetchTimeout and XLA failures (both
                # RuntimeError subclasses) must surface via _wrap,
                # not re-run against the same broken device
                hits = None
        if hits is None:
            hits = self.cx.search(req.query, limit=limit, flt=flt,
                                  decay=decay, recency_bias=rb)
        return pb.SearchResponse(hits=[
            pb.SearchHit(node=node_to_pb(n), score=s) for s, n in hits])

    def HybridSearch(self, req, ctx):
        res = self.cx.search_hybrid(
            req.query, anchors=list(req.anchors),
            limit=req.limit or 10,
            vector_weight=(req.vector_weight
                           if req.HasField("vector_weight")
                           else 0.7),
            kind_filter=list(req.kind_filter) or None,
            max_anchor_depth=req.max_anchor_depth or 3)
        return pb.HybridSearchResponse(hits=[
            pb.HybridHit(
                node=node_to_pb(r.node), vector_score=r.vector_score,
                graph_score=r.graph_score,
                combined_score=r.combined_score,
                nearest_anchor_id=(r.nearest_anchor[0]
                                   if r.nearest_anchor else ""),
                nearest_anchor_depth=(r.nearest_anchor[1]
                                      if r.nearest_anchor else 0))
            for r in res])

    # ----------------------------------------------------------- briefing
    def GetBriefing(self, req, ctx):
        b = self.cx.briefing_engine.generate(req.agent_id)
        return pb.BriefingResponse(
            agent_id=b.agent_id, generated_at=b.generated_at,
            nodes_consulted=b.nodes_consulted, cached=b.cached,
            sections=[pb.BriefingSection(
                title=s.title, nodes=[node_to_pb(n) for n in s.nodes])
                for s in b.sections],
            rendered=self.cx.briefing_engine.render(b, compact=req.compact))

    # -------------------------------------------------------------- admin
    def Stats(self, req, ctx):
        s = self.cx.stats()
        return pb.StatsResponse(
            node_count=s.node_count, edge_count=s.edge_count,
            deleted_node_count=s.deleted_node_count,
            nodes_by_kind=[pb.KindCount(key=k, count=v)
                           for k, v in sorted(s.nodes_by_kind.items())],
            edges_by_relation=[pb.KindCount(key=k, count=v)
                               for k, v in
                               sorted(s.edges_by_relation.items())],
            db_size_bytes=s.db_size_bytes, index_size=len(self.cx.index))

    def AutoLinkerStatus(self, req, ctx):
        m = self.cx.linker.metrics
        return pb.AutoLinkerStatusResponse(
            cycles_completed=m.cycles_completed,
            nodes_processed=m.nodes_processed,
            edges_created=m.edges_created, edges_pruned=m.edges_pruned,
            edges_deleted=m.edges_deleted,
            duplicates_found=m.duplicates_found,
            contradictions_found=m.contradictions_found,
            backlog_size=m.backlog_size, cursor=m.cursor,
            summary=m.summary())

    def TriggerAutoLink(self, req, ctx):
        m = self.cx.run_linker_cycle()
        return pb.TriggerAutoLinkResponse(
            nodes_processed=m.cycle_nodes_processed,
            edges_created=m.cycle_edges_created, summary=m.summary())

    def Reindex(self, req, ctx):
        return pb.ReindexResponse(nodes_reindexed=self.cx.reindex())

    def Health(self, req, ctx):
        return pb.HealthResponse(status="healthy", version="0.1.0")


def _wrap(impl, name):
    def handler(request, context):
        try:
            return getattr(impl, name)(request, context)
        except GateRejection as e:
            context.abort(grpc.StatusCode.FAILED_PRECONDITION, str(e))
        except (ValidationError, InvalidEdge) as e:
            context.abort(grpc.StatusCode.INVALID_ARGUMENT, str(e))
        except DuplicateEdge as e:
            context.abort(grpc.StatusCode.ALREADY_EXISTS, str(e))
        except NodeNotFound as e:
            context.abort(grpc.StatusCode.NOT_FOUND, str(e))
        except DeviceFetchTimeout as e:
            # wedged device/tunnel after bounded re-dispatch: retryable
            context.abort(grpc.StatusCode.UNAVAILABLE,
                          f"device unavailable: {e}")
        except CortexError as e:
            context.abort(grpc.StatusCode.INTERNAL, str(e))
    return handler


def make_handler(state: ServerState) -> grpc.GenericRpcHandler:
    impl = CortexServiceImpl(state)
    table = {
        name: grpc.unary_unary_rpc_method_handler(
            _wrap(impl, name),
            request_deserializer=reqc.FromString,
            response_serializer=respc.SerializeToString)
        for name, (reqc, respc) in METHODS.items()
    }
    return grpc.method_handlers_generic_handler(SERVICE, table)


class _AuthInterceptor(grpc.ServerInterceptor):
    """Bearer-token metadata check (serve.rs:316-332)."""

    def __init__(self, token: str):
        self.token = token

        def deny(request, context):
            context.abort(grpc.StatusCode.UNAUTHENTICATED,
                          "invalid or missing bearer token")
        self._deny = grpc.unary_unary_rpc_method_handler(deny)

    def intercept_service(self, continuation, handler_call_details):
        md = dict(handler_call_details.invocation_metadata or ())
        if md.get("authorization") == f"Bearer {self.token}":
            return continuation(handler_call_details)
        return self._deny


def create_grpc_server(state: ServerState, addr: str = "0.0.0.0:9090",
                       max_workers: int = 8) -> grpc.Server:
    interceptors = []
    if state.auth_token:
        interceptors.append(_AuthInterceptor(state.auth_token))
    server = grpc.server(
        futures.ThreadPoolExecutor(max_workers=max_workers),
        interceptors=interceptors)
    server.add_generic_rpc_handlers((make_handler(state),))
    server.add_insecure_port(addr)
    return server


class GrpcClient:
    """Thin typed client over the generic channel (the Rust
    cortex-client / Python SDK gRPC analog)."""

    def __init__(self, addr: str, token: Optional[str] = None):
        self.channel = grpc.insecure_channel(addr)
        self._token = token
        self._stubs = {}
        for name, (reqc, respc) in METHODS.items():
            self._stubs[name] = self.channel.unary_unary(
                f"/{SERVICE}/{name}",
                request_serializer=reqc.SerializeToString,
                response_deserializer=respc.FromString)

    def call(self, name: str, request):
        md = [("authorization", f"Bearer {self._token}")] \
            if self._token else None
        return self._stubs[name](request, metadata=md)

    def __getattr__(self, name):
        if name in METHODS:
            return lambda request: self.call(name, request)
        raise AttributeError(name)

    def close(self):
        self.channel.close()
