/**
 * cortex-memory TypeScript SDK — REST client.
 *
 * Parity: reference sdks/typescript/src/client.ts:66-194 (REST-based:
 * store / search / searchHybrid / briefing / traverse / getNode) plus
 * relate / deleteNode / stats. Zero dependencies (global fetch,
 * Node >= 18 or any modern runtime).
 */

export interface NodeData {
  id: string;
  kind: string;
  title: string;
  body: string;
  tags: string[];
  metadata: Record<string, unknown>;
  importance: number;
  agent?: string;
  createdAt?: number;
  updatedAt?: number;
}

export interface SearchHit {
  score: number;
  node: NodeData;
  vectorScore?: number;
  graphScore?: number;
}

export interface TraversalResult {
  nodes: NodeData[];
  edges: Array<Record<string, unknown>>;
  truncated: boolean;
}

export interface StoreOptions {
  importance?: number;
  tags?: string[];
  metadata?: Record<string, unknown>;
  agent?: string;
  gate?: boolean;
}

export interface CortexOptions {
  token?: string;
  timeoutMs?: number;
}

export class CortexError extends Error {
  constructor(
    message: string,
    public status?: number,
  ) {
    super(message);
    this.name = "CortexError";
  }
}

function nodeFromWire(d: any): NodeData {
  const data = d.data ?? d;
  return {
    id: d.id ?? "",
    kind: d.kind ?? "",
    title: data.title ?? d.title ?? "",
    body: data.body ?? d.body ?? "",
    tags: data.tags ?? d.tags ?? [],
    metadata: data.metadata ?? d.metadata ?? {},
    importance: d.importance ?? 0.5,
    agent: d.source?.agent,
    createdAt: d.created_at,
    updatedAt: d.updated_at,
  };
}

function hitFromWire(d: any): SearchHit {
  return {
    score: d.score ?? d.combined_score ?? 0,
    node: nodeFromWire(d.node ?? d),
    vectorScore: d.vector_score,
    graphScore: d.graph_score,
  };
}

export class Cortex {
  private base: string;
  private token?: string;
  private timeoutMs: number;

  constructor(addr: string, opts: CortexOptions = {}) {
    this.base = addr.replace(/\/$/, "");
    this.token = opts.token;
    this.timeoutMs = opts.timeoutMs ?? 30000;
  }

  private async request(
    method: string,
    path: string,
    opts: { params?: Record<string, unknown>; body?: unknown; headers?: Record<string, string> } = {},
  ): Promise<any> {
    let url = this.base + path;
    if (opts.params) {
      const qs = new URLSearchParams();
      for (const [k, v] of Object.entries(opts.params)) {
        if (v !== undefined && v !== null) qs.set(k, String(v));
      }
      const q = qs.toString();
      if (q) url += "?" + q;
    }
    const headers: Record<string, string> = {
      "content-type": "application/json",
      ...(opts.headers ?? {}),
    };
    if (this.token) headers.authorization = `Bearer ${this.token}`;
    let resp: Response;
    try {
      resp = await fetch(url, {
        method,
        headers,
        body: opts.body === undefined ? undefined : JSON.stringify(opts.body),
        signal: AbortSignal.timeout(this.timeoutMs),
      });
    } catch (e: any) {
      throw new CortexError(`cannot reach ${this.base}: ${e.message}`);
    }
    const payload: any = await resp.json().catch(() => ({}));
    if (!resp.ok || payload.ok === false) {
      throw new CortexError(payload.error ?? `HTTP ${resp.status}`, resp.status);
    }
    return payload.data;
  }

  /** Store a memory; returns the node id. */
  async store(kind: string, title: string, body = "", opts: StoreOptions = {}): Promise<string> {
    const headers: Record<string, string> = {};
    if (opts.agent) headers["x-agent-id"] = opts.agent;
    if (!opts.gate) headers["x-gate-override"] = "true";
    const d = await this.request("POST", "/nodes", {
      params: opts.gate ? undefined : { gate: "skip" },
      headers,
      body: {
        kind,
        title,
        body: body || title,
        importance: opts.importance ?? 0.5,
        tags: opts.tags ?? [],
        metadata: opts.metadata ?? {},
      },
    });
    return d.id;
  }

  async getNode(nodeId: string): Promise<NodeData | null> {
    try {
      return nodeFromWire(await this.request("GET", `/nodes/${nodeId}`));
    } catch (e) {
      if (e instanceof CortexError && e.status === 404) return null;
      throw e;
    }
  }

  async deleteNode(nodeId: string): Promise<boolean> {
    // MockCortex returns false for a missing node; the real client
    // must match (a 404 is "not found", not an application error)
    try {
      await this.request("DELETE", `/nodes/${nodeId}`);
      return true;
    } catch (e) {
      if (e instanceof CortexError && e.status === 404) return false;
      throw e;
    }
  }

  async relate(fromId: string, toId: string, relation: string, weight = 0.5): Promise<string> {
    const d = await this.request("POST", "/edges", {
      body: { from: fromId, to: toId, relation, weight },
    });
    return d.id;
  }

  async search(query: string, limit = 10): Promise<SearchHit[]> {
    const rows = await this.request("GET", "/search", { params: { q: query, limit } });
    return rows.map(hitFromWire);
  }

  async searchHybrid(
    query: string,
    anchors: string[] = [],
    limit = 10,
    vectorWeight = 0.7,
  ): Promise<SearchHit[]> {
    const rows = await this.request("GET", "/search/hybrid", {
      params: {
        q: query,
        anchors: anchors.length ? anchors.join(",") : undefined,
        limit,
        vector_weight: vectorWeight,
      },
    });
    return rows.map(hitFromWire);
  }

  async briefing(agentId: string, compact = false): Promise<string> {
    // format=json wraps the rendered text in the {ok,data} envelope;
    // the default text route returns raw markdown that won't JSON-parse
    const d = await this.request("GET", `/briefing/${encodeURIComponent(agentId)}`, {
      params: { format: "json", compact: compact ? "true" : undefined },
    });
    return typeof d === "string" ? d : (d.text ?? "");
  }

  async traverse(start: string, depth = 2): Promise<TraversalResult> {
    const d = await this.request("GET", `/nodes/${encodeURIComponent(start)}/neighbors`, {
      params: { depth },
    });
    return {
      nodes: (d.nodes ?? []).map(nodeFromWire),
      edges: d.edges ?? [],
      truncated: d.truncated ?? false,
    };
  }

  async stats(): Promise<Record<string, unknown>> {
    return this.request("GET", "/stats");
  }
}
