"""Regressions for the seventh self-review pass: CLI prompt/agent
parity (migrate idempotency, observe bookkeeping, remote branches),
neighbors direction, shell context reuse."""

import json

import pytest

from cortex_tpu.api import Cortex
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source


class _Args:
    """argparse.Namespace stand-in."""

    def __init__(self, **kw):
        self.json = True
        self.__dict__.update(kw)


class _Ctx:
    remote = None

    def __init__(self, cx):
        self._cx = cx

    def cortex(self):
        return self._cx


def _main_mod():
    # cli/__init__ re-exports the main FUNCTION, shadowing the module
    # on `import cortex_tpu.cli.main as m` — resolve via sys.modules
    import importlib
    return importlib.import_module("cortex_tpu.cli.main")


def _capture(monkeypatch):
    out = []
    monkeypatch.setattr(_main_mod(), "emit",
                        lambda args, data, human=None: out.append(data))
    return out


class TestPromptMigrateIdempotency:
    def test_non_contiguous_versions_do_not_duplicate(self, monkeypatch,
                                                      tmp_path):
        """File versions [2, 3] store as v1, v2 (the resolver numbers
        sequentially); a re-run must import NOTHING, not re-import the
        entry whose file-version has no stored counterpart."""
        from cortex_tpu.cli.agent_prompt import cmd_prompt_migrate
        out = _capture(monkeypatch)
        cx = Cortex.in_memory()
        mig = {"prompts": [{"slug": "helper", "type": "persona"}],
               "versions": [
                   {"slug": "helper", "branch": "main", "version": 2,
                    "content": {"sections": {"role": "v2 text"}}},
                   {"slug": "helper", "branch": "main", "version": 3,
                    "content": {"sections": {"role": "v3 text"}}}]}
        f = tmp_path / "mig.json"
        f.write_text(json.dumps(mig))
        args = _Args(file=str(f), dry_run=False)
        cmd_prompt_migrate(_Ctx(cx), args)
        assert out[-1]["created"] == 2
        cmd_prompt_migrate(_Ctx(cx), args)      # re-run: all skipped
        assert out[-1]["created"] == 0
        assert out[-1]["skipped"] == 2
        assert len(cx.prompts.list_versions("helper", "main")) == 2
        cx.close()


class TestCliObserveParity:
    def test_observe_writes_slug_ema_and_marker(self, monkeypatch):
        from cortex_tpu.cli.agent_prompt import cmd_agent_observe
        from cortex_tpu.prompt import PromptContent
        out = _capture(monkeypatch)
        cx = Cortex.in_memory()
        agent = Cortex.agent("kai", "Kai the CLI test agent")
        cx.store(agent)
        pid = cx.prompts.create_prompt(PromptContent(slug="helper"))
        cx.create_edge(Edge.new(agent.id, pid, "uses", 0.5,
                                EdgeProvenance.manual("t")))
        args = _Args(name="kai", variant_id=pid, sentiment=0.9,
                     corrections=0, outcome="success")
        cmd_agent_observe(_Ctx(cx), args)
        obs_id = out[-1]["observation"]
        obs = cx.get_node(obs_id)
        assert obs.metadata["variant_slug"] == "helper"
        uses = [e for e in cx.storage.edges_from(agent.id)
                if e.relation == "uses"][0]
        assert uses.weight != pytest.approx(0.5)   # EMA applied
        assert cx.get_node(agent.id).metadata[
            "active_variant_id"] == pid
        cx.close()

    def test_observe_with_bad_variant_does_not_crash(self, monkeypatch):
        from cortex_tpu.cli.agent_prompt import cmd_agent_observe
        out = _capture(monkeypatch)
        cx = Cortex.in_memory()
        cx.store(Cortex.agent("kai", "Kai the CLI test agent"))
        args = _Args(name="kai", variant_id="no-such-id",
                     sentiment=0.5, corrections=1, outcome="failure")
        assert cmd_agent_observe(_Ctx(cx), args) == 0
        cx.close()


class TestNeighborsDirection:
    def test_direction_param_filters(self):
        from tests.test_http import scenario

        async def s(client, cx, state):
            a = Node.new("fact", "Direction source node here",
                         "Body long enough for the gate checks.",
                         Source(agent="t"))
            b = Node.new("fact", "Direction target node here",
                         "Body long enough for the gate checks.",
                         Source(agent="t"))
            cx.store(a)
            cx.store(b)
            cx.create_edge(Edge.new(a.id, b.id, "related_to", 0.9,
                                    EdgeProvenance.manual("t")))
            r_out = await (await client.get(
                f"/nodes/{a.id}/neighbors",
                params={"direction": "outgoing"})).json()
            r_in = await (await client.get(
                f"/nodes/{a.id}/neighbors",
                params={"direction": "incoming"})).json()
            out_ids = {n["id"] for n in r_out["data"]["nodes"]}
            in_ids = {n["id"] for n in r_in["data"]["nodes"]}
            assert b.id in out_ids
            assert b.id not in in_ids
        scenario(s)


class TestRemoteCliBranches:
    def test_prompt_and_agent_commands_have_remote_paths(self):
        """Every command the docstring promises works over REST must
        actually branch on ctx.remote (they used to raise 'drop
        --server')."""
        import inspect
        from cortex_tpu.cli import agent_prompt as ap
        for fn in (ap.cmd_agent_list, ap.cmd_agent_show,
                   ap.cmd_prompt_list, ap.cmd_prompt_get,
                   ap.cmd_prompt_create, ap.cmd_prompt_performance,
                   ap.cmd_prompt_deploy, ap.cmd_prompt_rollback_status,
                   ap.cmd_prompt_unquarantine):
            assert "ctx.remote" in inspect.getsource(fn), fn.__name__


class TestShellContextReuse:
    def test_main_accepts_reused_context(self, tmp_path, monkeypatch):
        m = _main_mod()
        opened = []
        orig = m.CliContext.__init__

        def spy(self, args):
            opened.append(1)
            orig(self, args)
        monkeypatch.setattr(m.CliContext, "__init__", spy)
        ctx_args = m.build_parser().parse_args(
            ["--data-dir", str(tmp_path), "stats"])
        ctx = m.CliContext(ctx_args)
        try:
            assert m.main(["--data-dir", str(tmp_path), "stats"],
                          reuse_ctx=ctx) == 0
            assert m.main(["--data-dir", str(tmp_path), "stats"],
                          reuse_ctx=ctx) == 0
        finally:
            ctx.close()
        assert sum(opened) == 1     # one open for the whole session
