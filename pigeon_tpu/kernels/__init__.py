"""Pallas TPU kernels for the hot ops.

Kernels are drop-in accelerations behind functional switches (e.g.
``attn_impl='flash'`` on the model classes); every kernel has an XLA
reference path and a parity test against it.
"""
