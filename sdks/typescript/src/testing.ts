/**
 * MockCortex — hermetic in-memory fake for agent tests.
 *
 * Parity: reference sdks/typescript/src/testing.ts:43 — substring-match
 * search, no server.
 */

import type { NodeData, SearchHit, StoreOptions, TraversalResult } from "./client";

let counter = 0;

export class MockCortex {
  nodes = new Map<string, NodeData>();
  edges: Array<{ id: string; from: string; to: string; relation: string; weight: number }> = [];
  briefings = new Map<string, string>();
  calls: Array<[string, unknown[]]> = [];

  async store(kind: string, title: string, body = "", opts: StoreOptions = {}): Promise<string> {
    const id = `mock-${String(++counter).padStart(8, "0")}`;
    this.nodes.set(id, {
      id,
      kind,
      title,
      body: body || title,
      tags: opts.tags ?? [],
      metadata: opts.metadata ?? {},
      importance: opts.importance ?? 0.5,
      agent: opts.agent,
      createdAt: Date.now() / 1000,
      updatedAt: Date.now() / 1000,
    });
    this.calls.push(["store", [kind, title]]);
    return id;
  }

  async getNode(nodeId: string): Promise<NodeData | null> {
    return this.nodes.get(nodeId) ?? null;
  }

  async deleteNode(nodeId: string): Promise<boolean> {
    return this.nodes.delete(nodeId);
  }

  async relate(fromId: string, toId: string, relation: string, weight = 0.5): Promise<string> {
    const id = `mock-edge-${String(++counter).padStart(8, "0")}`;
    this.edges.push({ id, from: fromId, to: toId, relation, weight });
    return id;
  }

  async search(query: string, limit = 10): Promise<SearchHit[]> {
    this.calls.push(["search", [query]]);
    const terms = query.toLowerCase().split(/\s+/).filter(Boolean);
    const hits: SearchHit[] = [];
    for (const n of this.nodes.values()) {
      const hay = `${n.title} ${n.body} ${n.tags.join(" ")}`.toLowerCase();
      const matched = terms.filter((t) => hay.includes(t)).length;
      if (matched > 0) {
        hits.push({ score: (matched / terms.length) * (0.5 + n.importance / 2), node: n });
      }
    }
    hits.sort((a, b) => b.score - a.score);
    return hits.slice(0, limit);
  }

  async searchHybrid(query: string, anchors: string[] = [], limit = 10, vectorWeight = 0.7): Promise<SearchHit[]> {
    const hits = await this.search(query, limit);
    const anchorSet = new Set(anchors);
    const neighbors = new Set<string>();
    for (const e of this.edges) {
      if (anchorSet.has(e.from)) neighbors.add(e.to);
      if (anchorSet.has(e.to)) neighbors.add(e.from);
    }
    const out = hits.map((h) => {
      const g = anchorSet.has(h.node.id) ? 1.0 : neighbors.has(h.node.id) ? 0.5 : 0.0;
      return {
        score: vectorWeight * h.score + (1 - vectorWeight) * g,
        node: h.node,
        vectorScore: h.score,
        graphScore: g,
      };
    });
    out.sort((a, b) => b.score - a.score);
    return out;
  }

  async briefing(agentId: string, _compact = false): Promise<string> {
    const canned = this.briefings.get(agentId);
    if (canned !== undefined) return canned;
    const lines = [`# Briefing for ${agentId}`, ""];
    const ranked = [...this.nodes.values()].sort((a, b) => b.importance - a.importance).slice(0, 10);
    for (const n of ranked) lines.push(`- [${n.kind}] ${n.title}`);
    return lines.join("\n");
  }

  async traverse(start: string, depth = 2): Promise<TraversalResult> {
    const seen = new Set([start]);
    let frontier = new Set([start]);
    const edgesOut: Array<Record<string, unknown>> = [];
    for (let i = 0; i < depth; i++) {
      const next = new Set<string>();
      for (const e of this.edges) {
        if (frontier.has(e.from) && !seen.has(e.to)) {
          next.add(e.to);
          edgesOut.push(e);
        } else if (frontier.has(e.to) && !seen.has(e.from)) {
          next.add(e.from);
          edgesOut.push(e);
        }
      }
      for (const id of next) seen.add(id);
      frontier = next;
    }
    return {
      nodes: [...seen].filter((id) => this.nodes.has(id)).map((id) => this.nodes.get(id)!),
      edges: edgesOut,
      truncated: false,
    };
  }

  async stats(): Promise<Record<string, unknown>> {
    const byKind: Record<string, number> = {};
    for (const n of this.nodes.values()) byKind[n.kind] = (byKind[n.kind] ?? 0) + 1;
    return { node_count: this.nodes.size, edge_count: this.edges.length, nodes_by_kind: byKind };
  }
}
