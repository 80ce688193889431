"""Pallas TPU kernels for the hot compute paths.

Populated incrementally; every kernel has a pure-JAX reference implementation
in ``solvers/`` that tests compare against bit-for-bit (interpret mode on
CPU, compiled on TPU).
"""
