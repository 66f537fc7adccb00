"""Batched, jitted evaluation pipelines (SPair / NAVI / ScanNet / 2AFC).

The reference evaluates correspondence pair-at-a-time in Python
(``evaluate_spair_correspondence.py:106-123`` — SURVEY §3.2 "wholly
single-GPU, pair-at-a-time — the prime target for batched/jitted TPU
redesign"). Here each evaluator is a vmapped, jitted kernel over batches of
pairs with static shapes (keypoints padded + masked)."""
