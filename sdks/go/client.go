// Package cortex is the Go SDK for the cortex_tpu graph memory engine.
//
// Parity: reference sdks/go/client.go:29-171 (CreateNode / GetNode /
// Search / SearchHybrid / Briefing / BriefingCompact / Traverse) plus
// Relate / DeleteNode / Stats. The reference client speaks gRPC; this
// SDK speaks the framework's REST wire (stdlib net/http only, no
// generated protobuf), which carries the same operations.
package cortex

import (
	"bytes"
	"context"
	"encoding/json"
	"fmt"
	"net/http"
	"net/url"
	"strings"
	"time"
)

// Node is the wire representation of a graph node.
type Node struct {
	ID         string                 `json:"id"`
	Kind       string                 `json:"kind"`
	Title      string                 `json:"title"`
	Body       string                 `json:"body"`
	Tags       []string               `json:"tags"`
	Metadata   map[string]interface{} `json:"metadata"`
	Importance float64                `json:"importance"`
	Agent      string                 `json:"agent,omitempty"`
	CreatedAt  float64                `json:"created_at,omitempty"`
	UpdatedAt  float64                `json:"updated_at,omitempty"`
}

// SearchHit is one ranked search result.
type SearchHit struct {
	Score       float64 `json:"score"`
	Node        Node    `json:"node"`
	VectorScore float64 `json:"vector_score,omitempty"`
	GraphScore  float64 `json:"graph_score,omitempty"`
}

// Edge is the wire representation of a typed edge.
type Edge struct {
	ID       string  `json:"id"`
	From     string  `json:"from"`
	To       string  `json:"to"`
	Relation string  `json:"relation"`
	Weight   float64 `json:"weight"`
}

// Traversal is a subgraph returned by Traverse.
type Traversal struct {
	Nodes     []Node                   `json:"nodes"`
	Edges     []map[string]interface{} `json:"edges"`
	Truncated bool                     `json:"truncated"`
}

// Stats summarizes the store.
type Stats struct {
	NodeCount    int            `json:"node_count"`
	EdgeCount    int            `json:"edge_count"`
	NodesByKind  map[string]int `json:"nodes_by_kind"`
	DBSizeBytes  int64          `json:"db_size_bytes"`
	DeletedCount int            `json:"deleted_node_count"`
}

// StoreOptions configure CreateNode.
type StoreOptions struct {
	Importance float64
	Tags       []string
	Metadata   map[string]interface{}
	Agent      string
	Gate       bool // run the quality write gate (default: bypass)
}

// APIError is a non-2xx server response.
type APIError struct {
	Status  int
	Message string
}

func (e *APIError) Error() string {
	return fmt.Sprintf("cortex: %s (HTTP %d)", e.Message, e.Status)
}

// Client talks to a running cortex server.
type Client struct {
	base  string
	token string
	http  *http.Client
}

// Option configures a Client.
type Option func(*Client)

// WithToken sets the bearer auth token.
func WithToken(token string) Option {
	return func(c *Client) { c.token = token }
}

// WithHTTPClient overrides the underlying http.Client.
func WithHTTPClient(hc *http.Client) Option {
	return func(c *Client) { c.http = hc }
}

// New creates a client for addr (e.g. "http://localhost:9091").
func New(addr string, opts ...Option) *Client {
	c := &Client{
		base: strings.TrimRight(addr, "/"),
		http: &http.Client{Timeout: 30 * time.Second},
	}
	for _, o := range opts {
		o(c)
	}
	return c
}

type envelope struct {
	OK    bool            `json:"ok"`
	Data  json.RawMessage `json:"data"`
	Error string          `json:"error"`
}

func (c *Client) request(ctx context.Context, method, path string,
	params url.Values, body interface{}, headers map[string]string,
	out interface{}) error {
	u := c.base + path
	if len(params) > 0 {
		u += "?" + params.Encode()
	}
	var rdr *bytes.Reader
	if body != nil {
		raw, err := json.Marshal(body)
		if err != nil {
			return err
		}
		rdr = bytes.NewReader(raw)
	} else {
		rdr = bytes.NewReader(nil)
	}
	req, err := http.NewRequestWithContext(ctx, method, u, rdr)
	if err != nil {
		return err
	}
	req.Header.Set("content-type", "application/json")
	if c.token != "" {
		req.Header.Set("authorization", "Bearer "+c.token)
	}
	for k, v := range headers {
		req.Header.Set(k, v)
	}
	resp, err := c.http.Do(req)
	if err != nil {
		return fmt.Errorf("cortex: cannot reach %s: %w", c.base, err)
	}
	defer resp.Body.Close()
	var env envelope
	if err := json.NewDecoder(resp.Body).Decode(&env); err != nil {
		return &APIError{Status: resp.StatusCode, Message: "bad response"}
	}
	if resp.StatusCode >= 400 || !env.OK {
		msg := env.Error
		if msg == "" {
			msg = http.StatusText(resp.StatusCode)
		}
		return &APIError{Status: resp.StatusCode, Message: msg}
	}
	if out != nil && len(env.Data) > 0 {
		return json.Unmarshal(env.Data, out)
	}
	return nil
}

// wireNode matches the server's nested node JSON.
type wireNode struct {
	ID   string `json:"id"`
	Kind string `json:"kind"`
	Data struct {
		Title    string                 `json:"title"`
		Body     string                 `json:"body"`
		Tags     []string               `json:"tags"`
		Metadata map[string]interface{} `json:"metadata"`
	} `json:"data"`
	Source struct {
		Agent string `json:"agent"`
	} `json:"source"`
	Importance float64 `json:"importance"`
	CreatedAt  float64 `json:"created_at"`
	UpdatedAt  float64 `json:"updated_at"`
}

func (w wireNode) node() Node {
	return Node{
		ID: w.ID, Kind: w.Kind, Title: w.Data.Title, Body: w.Data.Body,
		Tags: w.Data.Tags, Metadata: w.Data.Metadata,
		Importance: w.Importance, Agent: w.Source.Agent,
		CreatedAt: w.CreatedAt, UpdatedAt: w.UpdatedAt,
	}
}

type wireHit struct {
	Score         float64  `json:"score"`
	CombinedScore float64  `json:"combined_score"`
	VectorScore   float64  `json:"vector_score"`
	GraphScore    float64  `json:"graph_score"`
	Node          wireNode `json:"node"`
}

// CreateNode stores a memory and returns its id.
func (c *Client) CreateNode(ctx context.Context, kind, title, body string,
	opts *StoreOptions) (string, error) {
	if opts == nil {
		opts = &StoreOptions{}
	}
	importance := opts.Importance
	if importance == 0 {
		// Go zero value: callers building StoreOptions{Tags: ...}
		// almost never mean literal minimum importance; match the
		// nil-opts / TS-SDK / server default. An explicit floor can
		// be expressed with any small positive value.
		importance = 0.5
	}
	params := url.Values{}
	headers := map[string]string{}
	if !opts.Gate {
		params.Set("gate", "skip")
		headers["x-gate-override"] = "true"
	}
	if opts.Agent != "" {
		headers["x-agent-id"] = opts.Agent
	}
	if body == "" {
		body = title
	}
	payload := map[string]interface{}{
		"kind": kind, "title": title, "body": body,
		"importance": importance, "tags": opts.Tags,
		"metadata": opts.Metadata,
	}
	var out struct {
		ID string `json:"id"`
	}
	err := c.request(ctx, http.MethodPost, "/nodes", params, payload,
		headers, &out)
	return out.ID, err
}

// GetNode fetches a node; returns (nil, nil) when missing.
func (c *Client) GetNode(ctx context.Context, id string) (*Node, error) {
	var w wireNode
	err := c.request(ctx, http.MethodGet, "/nodes/"+id, nil, nil, nil, &w)
	if err != nil {
		var apiErr *APIError
		if ok := asAPIError(err, &apiErr); ok && apiErr.Status == 404 {
			return nil, nil
		}
		return nil, err
	}
	n := w.node()
	return &n, nil
}

func asAPIError(err error, target **APIError) bool {
	e, ok := err.(*APIError)
	if ok {
		*target = e
	}
	return ok
}

// DeleteNode tombstones a node.
func (c *Client) DeleteNode(ctx context.Context, id string) error {
	return c.request(ctx, http.MethodDelete, "/nodes/"+id, nil, nil, nil,
		nil)
}

// Relate creates a typed edge and returns its id.
func (c *Client) Relate(ctx context.Context, from, to, relation string,
	weight float64) (string, error) {
	var out Edge
	err := c.request(ctx, http.MethodPost, "/edges", nil,
		map[string]interface{}{
			"from": from, "to": to, "relation": relation,
			"weight": weight,
		}, nil, &out)
	return out.ID, err
}

// Search runs semantic search.
func (c *Client) Search(ctx context.Context, query string, limit int) (
	[]SearchHit, error) {
	params := url.Values{"q": {query},
		"limit": {fmt.Sprintf("%d", limit)}}
	var rows []wireHit
	if err := c.request(ctx, http.MethodGet, "/search", params, nil, nil,
		&rows); err != nil {
		return nil, err
	}
	hits := make([]SearchHit, len(rows))
	for i, r := range rows {
		hits[i] = SearchHit{Score: r.Score, Node: r.Node.node()}
	}
	return hits, nil
}

// SearchHybrid fuses similarity with graph proximity to anchors.
func (c *Client) SearchHybrid(ctx context.Context, query string,
	anchors []string, limit int) ([]SearchHit, error) {
	params := url.Values{"q": {query},
		"limit": {fmt.Sprintf("%d", limit)}}
	if len(anchors) > 0 {
		params.Set("anchors", strings.Join(anchors, ","))
	}
	var rows []wireHit
	if err := c.request(ctx, http.MethodGet, "/search/hybrid", params,
		nil, nil, &rows); err != nil {
		return nil, err
	}
	hits := make([]SearchHit, len(rows))
	for i, r := range rows {
		hits[i] = SearchHit{
			Score: r.CombinedScore, Node: r.Node.node(),
			VectorScore: r.VectorScore, GraphScore: r.GraphScore,
		}
	}
	return hits, nil
}

// Briefing returns the rendered briefing text for an agent.
func (c *Client) Briefing(ctx context.Context, agentID string) (string,
	error) {
	return c.briefing(ctx, agentID, false)
}

// BriefingCompact returns the compact rendering.
func (c *Client) BriefingCompact(ctx context.Context, agentID string) (
	string, error) {
	return c.briefing(ctx, agentID, true)
}

func (c *Client) briefing(ctx context.Context, agentID string,
	compact bool) (string, error) {
	// the default text route returns raw markdown with no {ok,data}
	// envelope; format=json wraps the rendered text so it parses
	params := url.Values{"format": {"json"}}
	if compact {
		params.Set("compact", "true")
	}
	var obj struct {
		Text string `json:"text"`
	}
	if err := c.request(ctx, http.MethodGet,
		"/briefing/"+url.PathEscape(agentID), params, nil, nil,
		&obj); err != nil {
		return "", err
	}
	return obj.Text, nil
}

// Traverse returns the neighborhood subgraph of a node.
func (c *Client) Traverse(ctx context.Context, start string, depth int) (
	*Traversal, error) {
	params := url.Values{"depth": {fmt.Sprintf("%d", depth)}}
	var w struct {
		Nodes     []wireNode               `json:"nodes"`
		Edges     []map[string]interface{} `json:"edges"`
		Truncated bool                     `json:"truncated"`
	}
	if err := c.request(ctx, http.MethodGet,
		"/nodes/"+url.PathEscape(start)+"/neighbors", params, nil, nil,
		&w); err != nil {
		return nil, err
	}
	t := &Traversal{Edges: w.Edges, Truncated: w.Truncated}
	for _, n := range w.Nodes {
		t.Nodes = append(t.Nodes, n.node())
	}
	return t, nil
}

// Stats returns store statistics.
func (c *Client) Stats(ctx context.Context) (*Stats, error) {
	var s Stats
	if err := c.request(ctx, http.MethodGet, "/stats", nil, nil, nil,
		&s); err != nil {
		return nil, err
	}
	return &s, nil
}
