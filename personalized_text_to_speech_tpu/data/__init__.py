"""Data pipeline: audio IO, dataset/filelist loading, length-bucketed batching."""
