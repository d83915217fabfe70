"""Self-contained D3 force-graph SPA served as const HTML.

Role parity: cortex-server/src/http/viz.rs (a 559-line const-HTML D3
page). Fetches /graph/export and renders an interactive force layout
with kind-colored nodes, weight-scaled links, drag/zoom, a detail
panel, and the reference's control set: title search, kind filter,
min-importance slider, label toggle, and SVG/JSON export.
"""

VIZ_HTML = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>Cortex Graph</title>
<script src="https://cdn.jsdelivr.net/npm/d3@7"></script>
<style>
  body { margin: 0; font: 13px sans-serif; background: #0b0e14; color: #cdd6f4; }
  #panel { position: fixed; top: 10px; right: 10px; width: 300px;
           background: #151a25; border: 1px solid #2a3144; border-radius: 8px;
           padding: 12px; display: none; max-height: 80vh; overflow: auto; }
  #legend { position: fixed; top: 10px; left: 10px; background: #151a25cc;
            border-radius: 8px; padding: 8px 12px; }
  #controls { position: fixed; bottom: 10px; left: 10px; background: #151a25cc;
              border-radius: 8px; padding: 10px 12px; display: flex;
              flex-direction: column; gap: 6px; width: 220px; }
  #controls input[type=text], #controls select {
      background: #0b0e14; color: #cdd6f4; border: 1px solid #2a3144;
      border-radius: 4px; padding: 4px 6px; width: 100%; box-sizing: border-box; }
  #controls .row { display: flex; gap: 6px; align-items: center; }
  #controls button { background: #2a3144; color: #cdd6f4; border: none;
      border-radius: 4px; padding: 4px 10px; cursor: pointer; }
  #controls button:hover { background: #3b4361; }
  .legend-item { display: flex; align-items: center; gap: 6px; margin: 2px 0; }
  .dot { width: 10px; height: 10px; border-radius: 50%; }
  svg { width: 100vw; height: 100vh; }
  text { fill: #cdd6f4; pointer-events: none; font-size: 10px; }
  h3 { margin: 0 0 6px; }
  .muted { color: #7d8799; }
</style>
</head>
<body>
<div id="legend"></div>
<div id="controls">
  <input type="text" id="q" placeholder="filter by title...">
  <select id="kindsel"><option value="">all kinds</option></select>
  <div class="row"><input type="range" id="minimp" min="0" max="1"
       step="0.05" value="0" style="flex:1">
       <span id="minimpval">0.0</span></div>
  <div class="row"><label><input type="checkbox" id="labels" checked>
       labels</label></div>
  <div class="row"><button id="expsvg">SVG</button>
       <button id="expjson">JSON</button></div>
</div>
<div id="panel"></div>
<svg></svg>
<script>
const KIND_COLORS = {
  agent: "#f38ba8", decision: "#fab387", fact: "#89b4fa", event: "#a6e3a1",
  goal: "#f9e2af", preference: "#cba6f7", pattern: "#94e2d5",
  observation: "#74c7ec", prompt: "#eba0ac"
};
const color = k => KIND_COLORS[k] || "#9399b2";
// node content is ARBITRARY API-written text: everything interpolated
// into innerHTML must be escaped, or a stored title like
// <img onerror=...> executes in the viz origin (stored XSS)
const esc = s => String(s).replace(/[&<>"']/g, c => ({
  "&": "&amp;", "<": "&lt;", ">": "&gt;",
  '"': "&quot;", "'": "&#39;"}[c]));

fetch("/graph/export").then(r => r.json()).then(({data}) => {
  const nodes = data.nodes.map(n => ({id: n.id, kind: n.kind,
    title: n.data.title, importance: n.importance, raw: n}));
  const ids = new Set(nodes.map(n => n.id));
  const links = data.edges.filter(e => ids.has(e.from) && ids.has(e.to))
    .map(e => ({source: e.from, target: e.to, relation: e.relation,
                weight: e.weight}));

  const kinds = [...new Set(nodes.map(n => n.kind))].sort();
  d3.select("#legend").selectAll("div").data(kinds).join("div")
    .attr("class", "legend-item")
    .html(k => `<span class="dot" style="background:${color(k)}"></span>${esc(k)}`);

  const svg = d3.select("svg");
  const W = innerWidth, H = innerHeight;
  const g = svg.append("g");
  svg.call(d3.zoom().on("zoom", ev => g.attr("transform", ev.transform)));

  const sim = d3.forceSimulation(nodes)
    .force("link", d3.forceLink(links).id(d => d.id)
      .distance(d => 120 - 60 * d.weight))
    .force("charge", d3.forceManyBody().strength(-180))
    .force("center", d3.forceCenter(W / 2, H / 2));

  const link = g.append("g").selectAll("line").data(links).join("line")
    .attr("stroke", "#45506b").attr("stroke-opacity", 0.6)
    .attr("stroke-width", d => 0.5 + 2.5 * d.weight);

  const node = g.append("g").selectAll("circle").data(nodes).join("circle")
    .attr("r", d => 4 + 8 * d.importance)
    .attr("fill", d => color(d.kind))
    .call(d3.drag()
      .on("start", (ev, d) => { if (!ev.active) sim.alphaTarget(0.3).restart();
                                d.fx = d.x; d.fy = d.y; })
      .on("drag", (ev, d) => { d.fx = ev.x; d.fy = ev.y; })
      .on("end", (ev, d) => { if (!ev.active) sim.alphaTarget(0);
                              d.fx = null; d.fy = null; }))
    .on("click", (ev, d) => {
      const p = d3.select("#panel");
      p.style("display", "block").html(
        `<h3>${esc(d.title)}</h3>
         <div class="muted">${esc(d.kind)} · importance ${d.importance.toFixed(2)}</div>
         <p>${esc((d.raw.data.body || "").slice(0, 400))}</p>
         <div class="muted">tags: ${esc((d.raw.data.tags || []).join(", ") || "-")}</div>
         <div class="muted">id: ${esc(d.id)}</div>`);
    });

  const label = g.append("g").selectAll("text").data(nodes).join("text")
    .text(d => d.title.slice(0, 24));

  sim.on("tick", () => {
    link.attr("x1", d => d.source.x).attr("y1", d => d.source.y)
        .attr("x2", d => d.target.x).attr("y2", d => d.target.y);
    node.attr("cx", d => d.x).attr("cy", d => d.y);
    label.attr("x", d => d.x + 8).attr("y", d => d.y + 3);
  });

  // ---- controls: search / kind / importance filters, labels, export
  const kindSel = document.getElementById("kindsel");
  kinds.forEach(k => { const o = document.createElement("option");
                       o.value = k; o.textContent = k; kindSel.append(o); });
  function applyFilters() {
    const q = document.getElementById("q").value.toLowerCase();
    const kf = kindSel.value;
    const mi = +document.getElementById("minimp").value;
    document.getElementById("minimpval").textContent = mi.toFixed(1);
    const visible = d => (!q || d.title.toLowerCase().includes(q)) &&
                         (!kf || d.kind === kf) && d.importance >= mi;
    node.attr("display", d => visible(d) ? null : "none");
    label.attr("display", d =>
      visible(d) && document.getElementById("labels").checked ? null : "none");
    link.attr("display", d =>
      visible(d.source) && visible(d.target) ? null : "none");
  }
  for (const id of ["q", "kindsel", "minimp", "labels"])
    document.getElementById(id).addEventListener("input", applyFilters);
  document.getElementById("expjson").onclick = () => {
    const blob = new Blob([JSON.stringify(data, null, 2)],
                          {type: "application/json"});
    const a = Object.assign(document.createElement("a"),
      {href: URL.createObjectURL(blob), download: "cortex-graph.json"});
    a.click();
  };
  document.getElementById("expsvg").onclick = () => {
    // standalone file: explicit size/viewBox + inline styles (the page
    // CSS that sizes/styles the live svg does not serialize with it)
    const clone = svg.node().cloneNode(true);
    clone.setAttribute("xmlns", "http://www.w3.org/2000/svg");
    clone.setAttribute("width", innerWidth);
    clone.setAttribute("height", innerHeight);
    clone.setAttribute("viewBox", `0 0 ${innerWidth} ${innerHeight}`);
    clone.insertAdjacentHTML("afterbegin",
      `<style>text{fill:#cdd6f4;font:10px sans-serif}</style>
       <rect width="100%" height="100%" fill="#0b0e14"/>`);
    const src = new XMLSerializer().serializeToString(clone);
    const blob = new Blob([src], {type: "image/svg+xml"});
    const a = Object.assign(document.createElement("a"),
      {href: URL.createObjectURL(blob), download: "cortex-graph.svg"});
    a.click();
  };
});
</script>
</body>
</html>
"""
