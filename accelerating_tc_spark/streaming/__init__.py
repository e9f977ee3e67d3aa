"""Streaming surface — intentionally minimal.

The reference is a pure batch engine (SURVEY.md §2.9: no watermarks, no
stateful streaming, no late-data handling), and the north rule's
"resumable" requirement is met by checkpointed batch supersteps
(operators/supersteps.py), not Structured Streaming. An incremental
edge-ingestion path would be: `spark.readStream` over the pages table →
sources.pages.extract_links (mapInPandas works under streaming) →
append-mode sink to the edge table → periodic batch recompute of the
analytics. Deliberately not implemented: no reference capability maps
to it.
"""
