"""Structured Streaming surface.

The reference is a pure batch engine (SURVEY.md §2.9: no watermarks, no
stateful streaming), so everything here EXTENDS it with the streaming
shapes a link-graph pipeline needs:

- `edges.read_edge_stream` + `edges.TriangleMaintainer` — append-only edge
  ingestion with an EXACT incremental triangle count (Δ-degree
  decomposition inside foreachBatch; cost per batch ∝ |Δ|, never ∝ |E|),
  idempotent under re-delivery.
- `edges.windowed_event_counts` — watermarked tumbling-window aggregation
  over the driver's events schema (bounded state, late-data drop).

The north rule's "resumable" requirement is additionally met by
checkpointed batch supersteps (operators/supersteps.py).
"""
