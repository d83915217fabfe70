// Tests for the Go SDK against an httptest fake server (the reference
// tested against a bufconn/fake gRPC backend, sdks/go/client_test.go).
package cortex

import (
	"context"
	"encoding/json"
	"net/http"
	"net/http/httptest"
	"testing"
)

func fakeServer(t *testing.T) *httptest.Server {
	t.Helper()
	mux := http.NewServeMux()
	nodes := map[string]map[string]interface{}{}
	write := func(w http.ResponseWriter, data interface{}) {
		w.Header().Set("content-type", "application/json")
		_ = json.NewEncoder(w).Encode(map[string]interface{}{
			"ok": true, "data": data,
		})
	}
	mux.HandleFunc("/nodes", func(w http.ResponseWriter, r *http.Request) {
		if r.Method != http.MethodPost {
			http.NotFound(w, r)
			return
		}
		if r.Header.Get("authorization") != "Bearer tok" {
			w.WriteHeader(401)
			_ = json.NewEncoder(w).Encode(map[string]interface{}{
				"ok": false, "error": "unauthorized",
			})
			return
		}
		var body map[string]interface{}
		_ = json.NewDecoder(r.Body).Decode(&body)
		node := map[string]interface{}{
			"id": "n1", "kind": body["kind"],
			"data": map[string]interface{}{
				"title": body["title"], "body": body["body"],
				"tags": body["tags"],
			},
			"importance": body["importance"],
		}
		nodes["n1"] = node
		write(w, node)
	})
	mux.HandleFunc("/nodes/n1", func(w http.ResponseWriter, r *http.Request) {
		write(w, nodes["n1"])
	})
	mux.HandleFunc("/nodes/missing", func(w http.ResponseWriter, r *http.Request) {
		w.WriteHeader(404)
		_ = json.NewEncoder(w).Encode(map[string]interface{}{
			"ok": false, "error": "node not found",
		})
	})
	mux.HandleFunc("/search", func(w http.ResponseWriter, r *http.Request) {
		if r.URL.Query().Get("q") == "" {
			w.WriteHeader(400)
			return
		}
		write(w, []map[string]interface{}{
			{"score": 0.9, "node": nodes["n1"]},
		})
	})
	mux.HandleFunc("/search/hybrid", func(w http.ResponseWriter, r *http.Request) {
		write(w, []map[string]interface{}{
			{"combined_score": 0.8, "vector_score": 0.9,
				"graph_score": 0.5, "node": nodes["n1"]},
		})
	})
	mux.HandleFunc("/briefing/bot", func(w http.ResponseWriter, r *http.Request) {
		if r.URL.Query().Get("format") != "json" {
			// real server returns raw markdown here; clients must ask
			// for the json wrapping
			w.Write([]byte("# raw markdown, not an envelope"))
			return
		}
		if r.URL.Query().Get("compact") == "true" {
			write(w, map[string]string{"text": "compact briefing"})
			return
		}
		write(w, map[string]string{"text": "# Briefing for bot"})
	})
	mux.HandleFunc("/nodes/n1/neighbors", func(w http.ResponseWriter, r *http.Request) {
		write(w, map[string]interface{}{
			"nodes": []interface{}{nodes["n1"]},
			"edges": []interface{}{}, "truncated": false,
		})
	})
	mux.HandleFunc("/stats", func(w http.ResponseWriter, r *http.Request) {
		write(w, map[string]interface{}{
			"node_count": 1, "edge_count": 0,
			"nodes_by_kind": map[string]int{"fact": 1},
		})
	})
	mux.HandleFunc("/edges", func(w http.ResponseWriter, r *http.Request) {
		write(w, map[string]interface{}{"id": "e1"})
	})
	return httptest.NewServer(mux)
}

func TestCreateAndGetNode(t *testing.T) {
	srv := fakeServer(t)
	defer srv.Close()
	c := New(srv.URL, WithToken("tok"))
	ctx := context.Background()
	id, err := c.CreateNode(ctx, "fact", "Title here", "Body here", nil)
	if err != nil {
		t.Fatalf("CreateNode: %v", err)
	}
	if id != "n1" {
		t.Fatalf("id = %q, want n1", id)
	}
	n, err := c.GetNode(ctx, "n1")
	if err != nil || n == nil {
		t.Fatalf("GetNode: %v %v", n, err)
	}
	if n.Title != "Title here" || n.Kind != "fact" {
		t.Fatalf("unexpected node: %+v", n)
	}
}

func TestGetMissingNodeNil(t *testing.T) {
	srv := fakeServer(t)
	defer srv.Close()
	c := New(srv.URL, WithToken("tok"))
	n, err := c.GetNode(context.Background(), "missing")
	if err != nil || n != nil {
		t.Fatalf("want (nil, nil), got (%v, %v)", n, err)
	}
}

func TestAuthFailure(t *testing.T) {
	srv := fakeServer(t)
	defer srv.Close()
	c := New(srv.URL) // no token
	_, err := c.CreateNode(context.Background(), "fact", "t", "b", nil)
	apiErr, ok := err.(*APIError)
	if !ok || apiErr.Status != 401 {
		t.Fatalf("want 401 APIError, got %v", err)
	}
}

func TestSearchAndHybrid(t *testing.T) {
	srv := fakeServer(t)
	defer srv.Close()
	c := New(srv.URL, WithToken("tok"))
	ctx := context.Background()
	if _, err := c.CreateNode(ctx, "fact", "Title here", "", nil); err != nil {
		t.Fatal(err)
	}
	hits, err := c.Search(ctx, "query", 5)
	if err != nil || len(hits) != 1 || hits[0].Score != 0.9 {
		t.Fatalf("Search: %v %v", hits, err)
	}
	hy, err := c.SearchHybrid(ctx, "query", []string{"n1"}, 5)
	if err != nil || hy[0].GraphScore != 0.5 {
		t.Fatalf("SearchHybrid: %v %v", hy, err)
	}
}

func TestBriefingAndTraverseAndStats(t *testing.T) {
	srv := fakeServer(t)
	defer srv.Close()
	c := New(srv.URL, WithToken("tok"))
	ctx := context.Background()
	if _, err := c.CreateNode(ctx, "fact", "Title here", "", nil); err != nil {
		t.Fatal(err)
	}
	b, err := c.Briefing(ctx, "bot")
	if err != nil || b != "# Briefing for bot" {
		t.Fatalf("Briefing: %q %v", b, err)
	}
	bc, err := c.BriefingCompact(ctx, "bot")
	if err != nil || bc != "compact briefing" {
		t.Fatalf("BriefingCompact: %q %v", bc, err)
	}
	tr, err := c.Traverse(ctx, "n1", 2)
	if err != nil || len(tr.Nodes) != 1 {
		t.Fatalf("Traverse: %v %v", tr, err)
	}
	s, err := c.Stats(ctx)
	if err != nil || s.NodeCount != 1 {
		t.Fatalf("Stats: %v %v", s, err)
	}
}
