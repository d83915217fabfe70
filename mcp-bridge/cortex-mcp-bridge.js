#!/usr/bin/env node
/**
 * cortex-mcp-bridge — zero-install MCP stdio <-> REST proxy.
 *
 * Parity: reference mcp-bridge/cortex-mcp-bridge.js (280 LoC Node.js
 * REST proxy). Connects an MCP client (stdio JSON-RPC) to a running
 * cortex server's HTTP API. No dependencies beyond Node >= 18
 * (built-in fetch).
 *
 * Usage:
 *   CORTEX_URL=http://localhost:9091 [CORTEX_AUTH_TOKEN=...] \
 *     node cortex-mcp-bridge.js
 */

"use strict";

const BASE = (process.env.CORTEX_URL || "http://localhost:9091").replace(/\/$/, "");
const TOKEN = process.env.CORTEX_AUTH_TOKEN || "";
const PROTOCOL_VERSION = "2024-11-05";

const TOOLS = [
  {
    name: "cortex_store",
    description: "Store a memory (fact, decision, event, ...) in the graph.",
    inputSchema: {
      type: "object",
      properties: {
        kind: { type: "string" },
        title: { type: "string" },
        body: { type: "string" },
        importance: { type: "number" },
        tags: { type: "array", items: { type: "string" } },
      },
      required: ["kind", "title"],
    },
  },
  {
    name: "cortex_search",
    description: "Semantic search over stored memories.",
    inputSchema: {
      type: "object",
      properties: {
        query: { type: "string" },
        limit: { type: "integer" },
      },
      required: ["query"],
    },
  },
  {
    name: "cortex_recall",
    description: "Hybrid recall: similarity fused with graph proximity.",
    inputSchema: {
      type: "object",
      properties: {
        query: { type: "string" },
        anchors: { type: "array", items: { type: "string" } },
        limit: { type: "integer" },
      },
      required: ["query"],
    },
  },
  {
    name: "cortex_briefing",
    description: "Generate the context briefing for an agent.",
    inputSchema: {
      type: "object",
      properties: {
        agent_id: { type: "string" },
        compact: { type: "boolean" },
      },
      required: ["agent_id"],
    },
  },
  {
    name: "cortex_traverse",
    description: "Traverse the graph from a start node.",
    inputSchema: {
      type: "object",
      properties: {
        start: { type: "string" },
        depth: { type: "integer" },
        direction: { type: "string", enum: ["outgoing", "incoming", "both"] },
      },
      required: ["start"],
    },
  },
  {
    name: "cortex_relate",
    description: "Create a typed edge between two nodes.",
    inputSchema: {
      type: "object",
      properties: {
        from_id: { type: "string" },
        to_id: { type: "string" },
        relation: { type: "string" },
        weight: { type: "number" },
      },
      required: ["from_id", "to_id", "relation"],
    },
  },
  {
    name: "cortex_observe",
    description: "Record a performance observation for an agent + variant.",
    inputSchema: {
      type: "object",
      properties: {
        agent: { type: "string" },
        variant_id: { type: "string" },
        sentiment_score: { type: "number" },
        correction_count: { type: "integer" },
        task_outcome: { type: "string" },
      },
      required: ["agent", "variant_id"],
    },
  },
];

async function rest(method, path, { params, body } = {}) {
  let url = BASE + path;
  if (params) {
    const qs = new URLSearchParams();
    for (const [k, v] of Object.entries(params)) {
      if (v !== undefined && v !== null) qs.set(k, String(v));
    }
    url += "?" + qs.toString();
  }
  const headers = { "content-type": "application/json" };
  if (TOKEN) headers.authorization = `Bearer ${TOKEN}`;
  const resp = await fetch(url, {
    method,
    headers,
    body: body === undefined ? undefined : JSON.stringify(body),
    // a hung server must not hang the MCP client forever (the TS SDK
    // uses the same 30s abort)
    signal: AbortSignal.timeout(30000),
  });
  const payload = await resp.json().catch(() => ({}));
  if (!resp.ok || payload.ok === false) {
    throw new Error(payload.error || `HTTP ${resp.status}`);
  }
  return payload.data !== undefined ? payload.data : payload;
}

const TOOL_IMPL = {
  cortex_store: (a) =>
    rest("POST", "/nodes", {
      body: {
        kind: a.kind,
        title: a.title,
        body: a.body || a.title,
        importance: a.importance ?? 0.5,
        tags: a.tags || [],
      },
    }),
  cortex_search: (a) =>
    rest("GET", "/search", { params: { q: a.query, limit: a.limit ?? 10 } }),
  cortex_recall: (a) =>
    rest("GET", "/search/hybrid", {
      params: {
        q: a.query,
        anchors: (a.anchors || []).join(","),
        limit: a.limit ?? 10,
      },
    }),
  cortex_briefing: async (a) => {
    const d = await rest("GET", `/briefing/${encodeURIComponent(a.agent_id)}`, {
      params: { format: "json", compact: a.compact ? "true" : undefined },
    });
    return typeof d === "string" ? d : (d.text ?? "");
  },
  cortex_traverse: (a) =>
    rest("GET", `/nodes/${encodeURIComponent(a.start)}/neighbors`, {
      params: { depth: a.depth ?? 2, direction: a.direction || "outgoing" },
    }),
  cortex_relate: (a) =>
    rest("POST", "/edges", {
      body: {
        from: a.from_id,
        to: a.to_id,
        relation: a.relation,
        weight: a.weight ?? 0.5,
      },
    }),
  cortex_observe: (a) =>
    rest("POST", `/agents/${encodeURIComponent(a.agent)}/observe`, {
      body: {
        variant_id: a.variant_id,
        sentiment_score: a.sentiment_score ?? 0.5,
        correction_count: a.correction_count ?? 0,
        task_outcome: a.task_outcome || "unknown",
      },
    }),
};

async function handle(msg) {
  const id = msg.id;
  const respond = (result) => ({ jsonrpc: "2.0", id, result });
  const fail = (code, message) => ({ jsonrpc: "2.0", id, error: { code, message } });
  try {
    switch (msg.method) {
      case "initialize":
        return respond({
          protocolVersion: PROTOCOL_VERSION,
          capabilities: { tools: {}, resources: {} },
          serverInfo: { name: "cortex-mcp-bridge", version: "0.1.0" },
        });
      case "notifications/initialized":
      case "initialized":
        return null;
      case "ping":
        return respond({});
      case "tools/list":
        return respond({ tools: TOOLS });
      case "tools/call": {
        const { name, arguments: args = {} } = msg.params || {};
        const impl = TOOL_IMPL[name];
        if (!impl) return fail(-32602, `unknown tool: ${name}`);
        try {
          const out = await impl(args);
          const text = typeof out === "string" ? out : JSON.stringify(out);
          return respond({ content: [{ type: "text", text }], isError: false });
        } catch (e) {
          return respond({
            content: [{ type: "text", text: `error: ${e.message}` }],
            isError: true,
          });
        }
      }
      case "resources/list":
        return respond({
          resources: [
            { uri: "cortex://stats", name: "Store statistics", mimeType: "application/json" },
            { uri: "cortex://node/{id}", name: "Node by id", mimeType: "application/json" },
          ],
        });
      case "resources/read": {
        const uri = (msg.params || {}).uri || "";
        let data;
        if (uri === "cortex://stats") data = await rest("GET", "/stats");
        else if (uri.startsWith("cortex://node/"))
          data = await rest("GET", `/nodes/${uri.slice("cortex://node/".length)}`);
        else return fail(-32602, `unknown resource: ${uri}`);
        return respond({
          contents: [{ uri, mimeType: "application/json", text: JSON.stringify(data) }],
        });
      }
      default:
        if (id === undefined) return null;
        return fail(-32601, `method not found: ${msg.method}`);
    }
  } catch (e) {
    if (id === undefined) return null;
    return fail(-32000, e.message);
  }
}

let buffer = "";
process.stdin.setEncoding("utf8");
process.stdin.on("data", (chunk) => {
  buffer += chunk;
  let idx;
  while ((idx = buffer.indexOf("\n")) >= 0) {
    const line = buffer.slice(0, idx).trim();
    buffer = buffer.slice(idx + 1);
    if (!line) continue;
    let msg;
    try {
      msg = JSON.parse(line);
    } catch {
      process.stdout.write(
        JSON.stringify({ jsonrpc: "2.0", id: null, error: { code: -32700, message: "parse error" } }) + "\n",
      );
      continue;
    }
    handle(msg).then((resp) => {
      if (resp) process.stdout.write(JSON.stringify(resp) + "\n");
    });
  }
});
process.stdin.on("end", () => process.exit(0));
process.stderr.write(`cortex-mcp-bridge: proxying MCP stdio -> ${BASE}\n`);
