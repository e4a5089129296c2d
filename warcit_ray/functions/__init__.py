"""Pure scalar/vector function library (no Ray dependency).

Every function here reimplements an observable behavior of the
reference (cited per-function) from scratch, shaped for per-batch
vectorized use inside ``Dataset.map_batches``.
"""
