"""gRPC surface tests over a real in-process server + channel."""

import json

import grpc
import pytest

from cortex_tpu.api import Cortex
from cortex_tpu.server import cortex_pb2 as pb
from cortex_tpu.server.grpc_service import GrpcClient, create_grpc_server
from cortex_tpu.server.state import ServerState


@pytest.fixture
def rig():
    cx = Cortex.in_memory()
    state = ServerState(cortex=cx)
    server = create_grpc_server(state, addr="127.0.0.1:0")
    port = server.add_insecure_port("127.0.0.1:0")
    server.start()
    client = GrpcClient(f"127.0.0.1:{port}")
    yield client, cx
    client.close()
    server.stop(0)


def mk_node_req(title="The deploy uses blue-green strategy",
                body="Deployments are blue-green with health checks.",
                **kw):
    return pb.CreateNodeRequest(
        kind=kw.get("kind", "fact"), title=title, body=body,
        source_agent=kw.get("agent", "tester"),
        importance=kw.get("importance", 0.5),
        tags=kw.get("tags", []), skip_gate=kw.get("skip_gate", False))


class TestNodeRpcs:
    def test_create_get(self, rig):
        client, cx = rig
        resp = client.CreateNode(mk_node_req())
        nid = resp.node.id
        got = client.GetNode(pb.GetNodeRequest(id=nid))
        assert got.node.title == "The deploy uses blue-green strategy"

    def test_get_missing_not_found(self, rig):
        client, cx = rig
        with pytest.raises(grpc.RpcError) as ei:
            client.GetNode(pb.GetNodeRequest(id="ghost"))
        assert ei.value.code() == grpc.StatusCode.NOT_FOUND

    def test_gate_failed_precondition(self, rig):
        client, cx = rig
        with pytest.raises(grpc.RpcError) as ei:
            client.CreateNode(mk_node_req(title="x", body="y"))
        assert ei.value.code() == grpc.StatusCode.FAILED_PRECONDITION

    def test_update_reembeds(self, rig):
        client, cx = rig
        nid = client.CreateNode(mk_node_req()).node.id
        client.UpdateNode(pb.UpdateNodeRequest(
            id=nid, title="Now about zebras entirely",
            body="All about zebras and their stripes today"))
        hits = client.SimilaritySearch(pb.SimilaritySearchRequest(
            query="zebras stripes", limit=1))
        assert hits.hits[0].node.id == nid

    def test_list_with_dsl(self, rig):
        client, cx = rig
        client.CreateNode(mk_node_req())
        client.CreateNode(mk_node_req(
            kind="event", title="Deployed today without problems at all",
            body="The deployment happened and all was well ok"))
        resp = client.ListNodes(pb.ListNodesRequest(query_dsl="kind:event"))
        assert len(resp.nodes) == 1

    def test_delete(self, rig):
        client, cx = rig
        nid = client.CreateNode(mk_node_req()).node.id
        assert client.DeleteNode(pb.DeleteNodeRequest(id=nid)).deleted
        assert cx.get_node(nid).deleted


class TestEdgeGraphRpcs:
    def test_edges_and_traverse(self, rig):
        client, cx = rig
        a = client.CreateNode(mk_node_req()).node.id
        b = client.CreateNode(mk_node_req(
            title="Second fact node for edge test",
            body="Some other body content here entirely")).node.id
        e = client.CreateEdge(pb.CreateEdgeRequest(
            from_id=a, to_id=b, relation="led_to", weight=0.9))
        assert e.edge.relation == "led_to"
        with pytest.raises(grpc.RpcError) as ei:
            client.CreateEdge(pb.CreateEdgeRequest(
                from_id=a, to_id=b, relation="led_to", weight=0.9))
        assert ei.value.code() == grpc.StatusCode.ALREADY_EXISTS
        edges = client.GetEdges(pb.GetEdgesRequest(node_id=a,
                                                   direction="outgoing"))
        assert len(edges.edges) == 1
        sub = client.Traverse(pb.TraverseRequest(
            start=[a], max_depth=2, direction="outgoing",
            include_start=True))
        assert len(sub.nodes) == 2
        paths = client.FindPaths(pb.FindPathsRequest(from_id=a, to_id=b))
        assert paths.paths[0].length == 1
        nb = client.Neighborhood(pb.NeighborhoodRequest(node_id=a, depth=1))
        assert len(nb.nodes) == 2


class TestSearchBriefingAdmin:
    def test_similarity_search(self, rig):
        client, cx = rig
        client.CreateNode(mk_node_req(
            title="Postgres vacuum schedule runs nightly",
            body="The postgres vacuum process runs at two am"))
        resp = client.SimilaritySearch(pb.SimilaritySearchRequest(
            query="postgres vacuum", limit=1))
        assert resp.hits and resp.hits[0].score > 0

    def test_hybrid_search(self, rig):
        client, cx = rig
        a = client.CreateNode(mk_node_req()).node.id
        resp = client.HybridSearch(pb.HybridSearchRequest(
            query="deploy strategy", anchors=[a], limit=3))
        assert resp.hits

    def test_briefing(self, rig):
        client, cx = rig
        client.CreateNode(mk_node_req(
            kind="agent", title="Kai the assistant",
            body="Agent node body content here", agent="kai"))
        resp = client.GetBriefing(pb.BriefingRequest(agent_id="kai"))
        assert resp.agent_id == "kai"
        assert "Briefing" in resp.rendered

    def test_stats_linker_reindex_health(self, rig):
        client, cx = rig
        client.CreateNode(mk_node_req())
        s = client.Stats(pb.StatsRequest())
        assert s.node_count == 1 and s.index_size == 1
        t = client.TriggerAutoLink(pb.TriggerAutoLinkRequest())
        assert t.nodes_processed == 1
        st = client.AutoLinkerStatus(pb.AutoLinkerStatusRequest())
        assert st.cycles_completed == 1
        r = client.Reindex(pb.ReindexRequest())
        assert r.nodes_reindexed == 1
        h = client.Health(pb.HealthRequest())
        assert h.status == "healthy"


class TestAuth:
    def test_token_required(self):
        cx = Cortex.in_memory()
        state = ServerState(cortex=cx, auth_token="sekrit")
        server = create_grpc_server(state, addr="127.0.0.1:0")
        port = server.add_insecure_port("127.0.0.1:0")
        server.start()
        try:
            bad = GrpcClient(f"127.0.0.1:{port}")
            with pytest.raises(grpc.RpcError) as ei:
                bad.Health(pb.HealthRequest())
            assert ei.value.code() == grpc.StatusCode.UNAUTHENTICATED
            bad.close()
            good = GrpcClient(f"127.0.0.1:{port}", token="sekrit")
            assert good.Health(pb.HealthRequest()).status == "healthy"
            good.close()
        finally:
            server.stop(0)
