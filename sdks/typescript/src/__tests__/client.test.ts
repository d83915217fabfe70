/**
 * Jest tests for the TS SDK (reference sdks/typescript/src/__tests__/
 * client.test.ts, 234 LoC). MockCortex tests are hermetic; Cortex
 * tests stub global fetch.
 */

import { Cortex, CortexError } from "../client";
import { MockCortex } from "../testing";

describe("MockCortex", () => {
  test("store + substring search", async () => {
    const cx = new MockCortex();
    const id = await cx.store("fact", "Redis runs on port 6379", "cache layer uses redis");
    const hits = await cx.search("redis cache");
    expect(hits.length).toBeGreaterThan(0);
    expect(hits[0].node.id).toBe(id);
    expect(await cx.search("zzz-nope")).toEqual([]);
  });

  test("importance ranks results", async () => {
    const cx = new MockCortex();
    await cx.store("fact", "shared keyword low", "", { importance: 0.1 });
    const hi = await cx.store("fact", "shared keyword high", "", { importance: 0.9 });
    const hits = await cx.search("shared keyword");
    expect(hits[0].node.id).toBe(hi);
  });

  test("relate + traverse", async () => {
    const cx = new MockCortex();
    const a = await cx.store("decision", "pick grpc");
    const b = await cx.store("event", "grpc shipped");
    await cx.relate(a, b, "led_to", 0.8);
    const res = await cx.traverse(a, 1);
    expect(res.nodes.map((n) => n.id).sort()).toEqual([a, b].sort());
  });

  test("hybrid boosts anchor neighbors", async () => {
    const cx = new MockCortex();
    const a = await cx.store("fact", "alpha topic");
    const b = await cx.store("fact", "alpha neighbor");
    await cx.relate(a, b, "related_to");
    const hits = await cx.searchHybrid("alpha", [a]);
    const byId = Object.fromEntries(hits.map((h) => [h.node.id, h]));
    expect(byId[b].graphScore).toBe(0.5);
    expect(byId[a].graphScore).toBe(1.0);
  });

  test("briefing canned + generated", async () => {
    const cx = new MockCortex();
    cx.briefings.set("bot", "canned");
    expect(await cx.briefing("bot")).toBe("canned");
    await cx.store("fact", "alpha");
    expect(await cx.briefing("other")).toContain("alpha");
  });

  test("stats + call recording", async () => {
    const cx = new MockCortex();
    await cx.store("fact", "x");
    await cx.search("y");
    expect((await cx.stats()).node_count).toBe(1);
    expect(cx.calls).toContainEqual(["store", ["fact", "x"]]);
  });
});

describe("Cortex REST client", () => {
  const okJson = (data: unknown) =>
    ({ ok: true, status: 200, json: async () => ({ ok: true, data }) }) as unknown as Response;

  afterEach(() => jest.restoreAllMocks());

  test("store posts node and returns id", async () => {
    const fetchMock = jest.spyOn(globalThis, "fetch").mockResolvedValue(okJson({ id: "n1" }));
    const cx = new Cortex("http://x:9091", { token: "tok" });
    const id = await cx.store("fact", "t", "b", { tags: ["a"] });
    expect(id).toBe("n1");
    const [url, init] = fetchMock.mock.calls[0];
    expect(String(url)).toContain("/nodes");
    expect((init!.headers as Record<string, string>).authorization).toBe("Bearer tok");
    expect(JSON.parse(init!.body as string).kind).toBe("fact");
  });

  test("search parses hits", async () => {
    jest.spyOn(globalThis, "fetch").mockResolvedValue(
      okJson([{ score: 0.9, node: { id: "n1", kind: "fact", data: { title: "T", body: "B" } } }]),
    );
    const cx = new Cortex("http://x:9091");
    const hits = await cx.search("q");
    expect(hits[0].node.title).toBe("T");
    expect(hits[0].score).toBeCloseTo(0.9);
  });

  test("getNode returns null on 404", async () => {
    jest.spyOn(globalThis, "fetch").mockResolvedValue({
      ok: false,
      status: 404,
      json: async () => ({ ok: false, error: "node not found" }),
    } as unknown as Response);
    const cx = new Cortex("http://x:9091");
    expect(await cx.getNode("missing")).toBeNull();
  });

  test("server error raises CortexError", async () => {
    jest.spyOn(globalThis, "fetch").mockResolvedValue({
      ok: false,
      status: 422,
      json: async () => ({ ok: false, error: "bad node" }),
    } as unknown as Response);
    const cx = new Cortex("http://x:9091");
    await expect(cx.store("fact", "t")).rejects.toThrow(CortexError);
  });

  test("unreachable raises CortexError", async () => {
    jest.spyOn(globalThis, "fetch").mockRejectedValue(new Error("ECONNREFUSED"));
    const cx = new Cortex("http://x:9091");
    await expect(cx.stats()).rejects.toThrow(/cannot reach/);
  });
});
