"""Vectorized Arrow kernels + chain compiler (the map_batches engine core)."""

from .compiler import ColumnErrors, CompiledChain, compile_chain
from .kernels import KernelResult, ScalarFallbackKernel, make_kernel

__all__ = [
    'ColumnErrors',
    'CompiledChain',
    'KernelResult',
    'ScalarFallbackKernel',
    'compile_chain',
    'make_kernel',
]
