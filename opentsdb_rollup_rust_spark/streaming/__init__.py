"""Structured Streaming surface (SURVEY.md §2.9): the batch rollup
semantics re-expressed over streams — tumbling/sliding/session windows
with watermarked late-data handling, plus a custom stateful
forward-fill operator."""
