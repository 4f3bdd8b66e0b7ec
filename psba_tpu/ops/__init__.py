"""TPU kernels and backend-dispatched primitives.

`reduce.indexed_sum` picks the reduction implementation per backend;
Pallas kernels live beside their XLA reference implementations and are
selected through the same dispatch points.
"""
