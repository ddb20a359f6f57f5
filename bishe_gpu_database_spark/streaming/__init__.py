"""Structured Streaming surface: windows, watermarks, sessionization,
dedup, and the streamed Aria epoch driver (foreachBatch).

The reference's epoch loop *is* a hand-rolled micro-batch engine — epoch ≡
trigger interval, Collect ≡ state commit, retry queue ≡ carried state
(ref: src/database/ycsb/db.h:104-125). ``streams`` re-expresses it on
Structured Streaming; ``batch_twins`` holds oracle-checkable batch
formulations of every streaming aggregation (SURVEY.md §5 strategy).
"""
