"""Chain compiler: FilterChain spec → vectorized column transform.

Implements the reference's per-value short-circuit (reference
base.py:521-532) with error masks instead of control flow: kernel *k+1*'s
results are only taken for rows whose error mask is still clear, and a
row's value freezes at its replacement the moment it errors.

Chain specs (class, instance, ``a | b``) are the same objects the scalar
API builds — compile once per actor/worker (stateful-stage rule,
SURVEY.md §3.4), apply per batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import base as fbase
from .kernels import KernelResult, make_kernel

__all__ = ['ColumnErrors', 'CompiledChain', 'compile_chain']


@dataclass
class ColumnErrors:
    """Per-row error codes for one column: parallel lists of row index
    arrays + (code, subkey) labels, cheap to merge across columns."""

    n: int
    entries: List[Tuple[np.ndarray, str, str]] = field(default_factory=list)

    def add(self, mask: np.ndarray, code: str, subkey: str = '') -> None:
        if mask.any():
            self.entries.append((np.flatnonzero(mask), code, subkey))

    @property
    def row_mask(self) -> np.ndarray:
        mask = np.zeros(self.n, dtype=bool)
        for rows, _, _ in self.entries:
            mask[rows] = True
        return mask

    def codes_per_row(self) -> List[List[Tuple[str, str]]]:
        out: List[List[Tuple[str, str]]] = [[] for _ in range(self.n)]
        for rows, code, subkey in self.entries:
            for i in rows:
                out[i].append((subkey, code))
        return out


def _is_binary_like(t: pa.DataType) -> bool:
    return (
        pa.types.is_binary(t) or pa.types.is_large_binary(t)
        or pa.types.is_fixed_size_binary(t)
    )


class CompiledChain:
    """A filter chain compiled to a sequence of column kernels."""

    def __init__(self, spec: fbase.FilterCompatible) -> None:
        resolved = fbase.BaseFilter.resolve(spec)
        if isinstance(resolved, fbase.FilterChain):
            members = list(resolved._filters)
        elif resolved is None:
            members = []
        else:
            members = [resolved]
        # Filters whose scalar output is a Python object that Arrow must
        # re-represent (UUID → canonical string) are only vector-safe as
        # the LAST member: a downstream member would see the string in
        # the vector path but the object in the scalar path, diverging
        # on error codes (e.g. Uuid | Regex: wrong_type vs malformed).
        # Such chains run whole-chain scalar, preserving object flow.
        # Decimal and Round are representation-bearing the same way:
        # their scalar outputs are Decimal OBJECTS, which a column can
        # only hold as decimal128 at one batch-wide scale — or, when a
        # batch value exceeds 38 digits (a 1e300 float expansion), as
        # strings. Either materialization changes what a downstream
        # member observes (Unicode renders '-3.0' for the scalar chain's
        # '-3'; Regex flags 'malformed' where the scalar chain says
        # 'wrong_type' — soak findings, r3). Mid-chain, they route the
        # whole chain scalar; as the LAST member the materialization is
        # the documented output-representation erasure, not a semantic
        # change.
        from ..functions import number as fnumber
        from ..functions import string as fstring
        from .kernels import ScalarFallbackKernel

        object_bearing = (fstring.Uuid, fnumber.Decimal, fnumber.Round)
        if any(isinstance(m, object_bearing) for m in members[:-1]):
            members = [resolved]
            self._members = members
            self._kernels = [ScalarFallbackKernel(resolved)]
        else:
            self._members = members
            self._kernels = [make_kernel(m) for m in members]
        self._scalar_fallbacks: dict = {}

    def apply_column(self, arr) -> Tuple[pa.Array, ColumnErrors]:
        """Apply the chain to a column; returns (values, errors).

        For rows that errored, the returned value is the row's replacement
        (null, except e.g. MaxBytes truncation).
        """
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_dictionary(arr.type):
            return self._apply_dictionary(arr)
        enc = self._maybe_auto_encode(arr)
        if enc is not None:
            self.dict_fast_path_hits += 1
            return self._apply_dictionary(enc)
        n = len(arr)
        errors = ColumnErrors(n)
        ok = np.ones(n, dtype=bool)
        current = arr
        # (mask, values-at-error) pairs to stitch replacements back in.
        frozen: List[Tuple[np.ndarray, pa.Array]] = []

        for ki, kernel in enumerate(self._kernels):
            try:
                result: KernelResult = kernel(current)
            except Exception:  # noqa: BLE001
                # A vector kernel met a type/shape it cannot handle (e.g.
                # Max(3) over a string column). The scalar path defines the
                # semantics for every input — fall back for this batch.
                fallback = self._scalar_fallbacks.get(ki)
                if fallback is None:
                    from .kernels import ScalarFallbackKernel
                    fallback = ScalarFallbackKernel(self._members[ki])
                    self._scalar_fallbacks[ki] = fallback
                result = fallback(current)
            newly = np.zeros(n, dtype=bool)
            for mask, code, subkey in result.errors:
                effective = mask & ok
                errors.add(effective, code, subkey)
                newly |= effective
            if newly.any():
                frozen.append((newly, result.values))
                ok &= ~newly
            current = result.values
            if not ok.any():
                break

        return self._stitch(current, frozen, n), errors

    # Auto-encode gate (VERDICT r4 #8): parquet readers decode dictionary
    # pages back to plain strings, so the dictionary fast path was
    # unreachable from a real read. Probe a prefix; when a big string
    # column is low-cardinality (CDC's repo/lang/op), one C hash pass
    # buys running the whole chain over the uniques instead of every row.
    _DICT_MIN_ROWS = 4096        # below this the plain path is cheap anyway
    _DICT_PROBE = 1024           # prefix rows to probe
    _DICT_PROBE_MAX_UNIQUE = 128  # probe uniques above this → skip
    dict_fast_path_hits = 0      # instance-shadowed instrumentation counter

    def _maybe_auto_encode(self, arr: pa.Array):
        """Dictionary-encode a plain low-cardinality string column so the
        dictionary fast path fires on parquet-decoded input; returns the
        DictionaryArray, or None to take the plain path. Output values and
        error masks are identical either way (`_apply_dictionary` gathers
        decoded results back through the indices; parity-tested).

        ``GRAFT_NO_AUTO_DICT=1`` holds the gate shut (A/B benchmarking)."""
        if os.environ.get('GRAFT_NO_AUTO_DICT'):
            return None
        if len(arr) < self._DICT_MIN_ROWS:
            return None
        if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
            return None
        probe = arr.slice(0, self._DICT_PROBE)
        if len(pc.unique(probe)) > self._DICT_PROBE_MAX_UNIQUE:
            return None
        enc = pc.dictionary_encode(arr)
        # Prefix lied (e.g. locally-clustered data): encoding a
        # high-cardinality column would make the chain run over ~all
        # values anyway, plus gather overhead — fall back.
        if len(enc.dictionary) > len(arr) // 4:
            return None
        return enc

    def _apply_dictionary(self, arr: pa.DictionaryArray):
        """Dictionary fast path (VERDICT r3 #7): run the chain ONCE over
        the dictionary's unique values (plus one null sentinel standing
        in for every null row — chains are per-value, so the null
        outcome is uniform), then gather values and error masks back
        through the indices. Cost: chain over n_unique values + O(n)
        gathers — the win on low-cardinality string columns (repo/lang
        in the CDC schema). Semantics are identical to applying the
        chain to the decoded column (parity-tested in test_vector.py):
        the scalar side sees decoded Python values either way."""
        n = len(arr)
        vals = arr.dictionary
        sentinel = len(vals)
        vals_plus = pa.concat_arrays([vals, pa.nulls(1, type=vals.type)])
        out_vals, val_errors = self.apply_column(vals_plus)

        idx = pc.fill_null(arr.indices, sentinel).cast(pa.int64())
        idx_np = np.asarray(idx.to_numpy(zero_copy_only=False), dtype=np.int64)
        out = out_vals.take(idx)

        errors = ColumnErrors(n)
        for rows, code, subkey in val_errors.entries:
            mask_vals = np.zeros(sentinel + 1, dtype=bool)
            mask_vals[rows] = True
            errors.add(mask_vals[idx_np], code, subkey)
        return out, errors

    @staticmethod
    def _stitch(
        current: pa.Array,
        frozen: List[Tuple[np.ndarray, pa.Array]],
        n: int,
    ) -> pa.Array:
        """Overlay frozen replacement values onto the final array."""
        if not frozen:
            return current
        out = current
        for mask, vals in frozen:
            # Fast path: nearly every filter's replacement for an errored
            # row is null — then the overlay is just "null out the masked
            # rows", no cross-type stitching (measured: the Python
            # fallback below cost 0.4s/batch on the CDC commit chain).
            masked_vals = vals.filter(pa.array(mask))
            if masked_vals.null_count == len(masked_vals):
                out = pc.if_else(
                    pa.array(~mask), out, pa.scalar(None, type=out.type),
                )
                continue
            if vals.type != out.type:
                # A binary↔string cast would silently re-type the
                # replacement (MaxBytes' truncated BYTES must stay bytes
                # even when the chain's output column is string — soak
                # finding, r3); only same-representation casts are safe.
                bin_str_clash = (
                    _is_binary_like(vals.type) != _is_binary_like(out.type)
                )
                try:
                    if bin_str_clash:
                        raise pa.ArrowTypeError('binary/string clash')
                    vals = vals.cast(out.type)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    # Rare type clash (e.g. replacement bytes into a string
                    # chain output): stitch in Python.
                    out_py = out.to_pylist()
                    vals_py = vals.to_pylist()
                    for i in np.flatnonzero(mask):
                        out_py[i] = vals_py[i]
                    out = pa.array(out_py)
                    continue
            try:
                out = pc.if_else(pa.array(~mask), out, vals)
            except pa.ArrowNotImplementedError:
                # if_else not implemented for this type (nested lists):
                # take() based overlay.
                idx = np.arange(n)
                take_from_vals = np.flatnonzero(mask)
                out_py = out.to_pylist()
                vals_py = vals.to_pylist()
                for i in take_from_vals:
                    out_py[i] = vals_py[i]
                out = pa.array(out_py, type=out.type)
        return out


def compile_chain(spec: fbase.FilterCompatible) -> CompiledChain:
    return CompiledChain(spec)
