"""Type-layer tests (parity: reference types.rs in-file tests)."""

import pytest

from cortex_tpu.errors import ValidationError
from cortex_tpu.types import (Edge, EdgeProvenance, Node, Source,
                              kind_display, new_id, relation_display,
                              validate_kind, validate_relation)


def mknode(**kw):
    defaults = dict(kind="fact", title="A valid title here", body="Some body",
                    source=Source(agent="tester"))
    defaults.update(kw)
    return Node.new(defaults.pop("kind"), defaults.pop("title"),
                    defaults.pop("body"), defaults.pop("source"),
                    **defaults)


class TestNodeKind:
    def test_valid(self):
        assert validate_kind("fact") == "fact"
        assert validate_kind("my-kind-2") == "my-kind-2"

    def test_empty(self):
        with pytest.raises(ValidationError):
            validate_kind("")

    def test_uppercase_rejected(self):
        with pytest.raises(ValidationError):
            validate_kind("Fact")

    def test_underscore_rejected(self):
        with pytest.raises(ValidationError):
            validate_kind("my_kind")

    def test_display(self):
        assert kind_display("fact") == "Fact"
        assert kind_display("") == ""


class TestRelation:
    def test_valid(self):
        assert validate_relation("related_to") == "related_to"

    def test_hyphen_rejected(self):
        with pytest.raises(ValidationError):
            validate_relation("related-to")

    def test_display(self):
        assert relation_display("related_to") == "RelatedTo"
        assert relation_display("uses") == "Uses"


class TestNodeValidation:
    def test_valid_node(self):
        mknode().validate()

    def test_title_too_long(self):
        n = mknode()
        n.title = "x" * 257
        with pytest.raises(ValidationError, match="256"):
            n.validate()

    def test_importance_clamped_on_new(self):
        n = mknode(importance=5.0)
        assert n.importance == 1.0
        n2 = mknode(importance=-1.0)
        assert n2.importance == 0.0

    def test_importance_out_of_range(self):
        n = mknode()
        n.importance = 1.5
        with pytest.raises(ValidationError):
            n.validate()

    def test_too_many_tags(self):
        n = mknode()
        n.tags = [f"tag-{i}" for i in range(33)]
        with pytest.raises(ValidationError, match="32"):
            n.validate()

    def test_tag_charset(self):
        n = mknode()
        n.tags = ["bad tag"]
        with pytest.raises(ValidationError):
            n.validate()

    def test_tag_uppercase(self):
        n = mknode()
        n.tags = ["BadTag"]
        with pytest.raises(ValidationError, match="lowercase"):
            n.validate()

    def test_tag_too_long(self):
        n = mknode()
        n.tags = ["t" * 65]
        with pytest.raises(ValidationError, match="64"):
            n.validate()

    def test_record_access(self):
        n = mknode()
        before = n.access_count
        n.record_access()
        assert n.access_count == before + 1
        assert n.last_accessed_at > 0


class TestEdge:
    def test_self_edge_rejected(self):
        nid = new_id()
        e = Edge.new(nid, nid, "related_to", 0.5, EdgeProvenance.manual("t"))
        with pytest.raises(ValidationError, match="Self-edge"):
            e.validate()

    def test_weight_clamped(self):
        e = Edge.new(new_id(), new_id(), "related_to", 2.0,
                     EdgeProvenance.manual("t"))
        assert e.weight == 1.0

    def test_provenance_roundtrip(self):
        for p in [EdgeProvenance.manual("me"),
                  EdgeProvenance.auto_similarity(0.9),
                  EdgeProvenance.auto_structural("same_agent"),
                  EdgeProvenance.auto_contradiction("negation"),
                  EdgeProvenance.auto_dedup(0.95),
                  EdgeProvenance.imported("alexandria")]:
            assert EdgeProvenance.from_dict(p.to_dict()) == p

    def test_update_weight(self):
        e = Edge.new(new_id(), new_id(), "uses", 0.5, EdgeProvenance.manual("t"))
        old = e.updated_at
        e.update_weight(0.9)
        assert e.weight == pytest.approx(0.9)
        assert e.updated_at >= old


class TestSerde:
    def test_node_roundtrip(self):
        n = mknode()
        n.tags = ["alpha", "beta"]
        n.metadata = {"url": "http://x", "n": 3}
        n.embedding = [0.1, 0.2, 0.3]
        n2 = Node.from_dict(n.to_dict())
        assert n2 == n

    def test_edge_roundtrip(self):
        e = Edge.new(new_id(), new_id(), "led_to", 0.7,
                     EdgeProvenance.auto_similarity(0.7))
        assert Edge.from_dict(e.to_dict()) == e

    def test_uuid7_time_sortable(self):
        ids = [new_id() for _ in range(10)]
        assert ids == sorted(ids)
