"""Pipeline: composition and execution of stream operators.

The reference composes operators with ``>->`` and drives them with
``runEffect`` — a pull-based loop where each operator awaits blocks
(examples/fm/fm.hs:32-41).  Here composition is function composition inside
one jitted step:

    step : (carries, in_block) -> (carries, out_block)

and the drive loop is either ``lax.scan`` over a recorded signal (whole
stream stays on device — the offline/benchmark path) or a host loop feeding
live blocks (the device-I/O path).  The pipeline's carry pytree is the
explicit, snapshottable analog of the state the reference hides inside
closures; ``checkpoint``/``restore`` give deterministic resume — the
subsystem the reference lacks (SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import Any, Iterable, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from sdr_tpu.stream.block import StreamOp

__all__ = ["Pipeline"]


class Pipeline:
    """A chain of :class:`StreamOp`, specialized to a source block size.

    ``block_in`` is the input block length (in source samples); per-op
    block lengths and dtypes are propagated statically at construction and
    validated (the divisibility discipline that replaces the reference's
    dynamic output Buffer accounting, Filter.hs:504-523).
    """

    def __init__(self, ops: Sequence[StreamOp], block_in: int,
                 in_dtype=jnp.uint8, batch_shape=()):
        self.ops = list(ops)
        self.block_in = int(block_in)
        self.in_dtype = in_dtype
        self.batch_shape = tuple(batch_shape)
        # static rate/dtype propagation
        self.lens = [self.block_in]
        self.dtypes = [in_dtype]
        for i, op in enumerate(self.ops):
            try:
                self.lens.append(op.out_len(self.lens[-1]))
            except ValueError as e:
                raise ValueError(
                    f"stage {i} ({op!r}) rejects block of {self.lens[-1]} "
                    f"samples: {e}") from None
            self.dtypes.append(op.out_dtype(self.dtypes[-1]))
        self.block_out = self.lens[-1]
        self.out_dtype = self.dtypes[-1]

    # -- state -------------------------------------------------------------

    def init(self):
        """Initial carry pytree (a list, one entry per op)."""
        return [op.init_carry(n, dt, self.batch_shape)
                for op, n, dt in zip(self.ops, self.lens, self.dtypes)]

    # -- execution ---------------------------------------------------------

    def apply(self, carries, x):
        """One block through the whole chain.  Pure; jit/scan/shard-safe."""
        new_carries = []
        for op, c in zip(self.ops, carries):
            c, x = op.apply(c, x)
            new_carries.append(c)
        return new_carries, x

    def jit_step(self, donate: bool = True):
        """Jitted single-block step; carries donated to avoid copies."""
        return jax.jit(self.apply,
                       donate_argnums=(0,) if donate else ())

    def scan(self, blocks, carries=None):
        """Run over stacked blocks [num_blocks, ..., block_in] with
        ``lax.scan`` (the whole stream resident on device).

        Returns (final_carries, out_blocks [num_blocks, ..., block_out]).
        """
        if carries is None:
            carries = self.init()

        def step(c, xb):
            c, y = self.apply(c, xb)
            return c, y

        return jax.lax.scan(step, carries, blocks)

    def run(self, source: Iterable[np.ndarray], carries=None):
        """Host drive loop over an iterator of blocks (live-source path).

        Yields output blocks as device arrays; the reference analog is
        ``runEffect`` pulling from an ``sdrStream`` mailbox
        (examples/fm/fm.hs:32).
        """
        if carries is None:
            carries = self.init()
        step = self.jit_step()
        for blk in source:
            carries, y = step(carries, jnp.asarray(blk))
            yield y

    def process(self, signal, carries=None):
        """Convenience: chop a recorded signal [..., N] into blocks, scan,
        and concatenate the per-block outputs back along the stream axis.

        Works for 1-D-per-block ops (output [..., M]) and frame-producing
        ops like :class:`FftStream` (output [..., frames, size], frames
        concatenated)."""
        signal = jnp.asarray(signal)
        n = signal.shape[-1]
        nblocks = n // self.block_in
        x = signal[..., : nblocks * self.block_in]
        lead = x.shape[:-1]
        blocks = jnp.moveaxis(
            x.reshape(lead + (nblocks, self.block_in)), -2, 0)
        carries, ys = self.scan(blocks, carries)
        # ys: [nblocks, *lead, ...per-block-shape]
        per_block = ys.ndim - 1 - len(lead)
        stream_axis = ys.ndim - per_block  # first per-block axis
        out = jnp.moveaxis(ys, 0, stream_axis - 1)
        shape = (out.shape[: stream_axis - 1]
                 + (out.shape[stream_axis - 1] * out.shape[stream_axis],)
                 + out.shape[stream_axis + 1:])
        return carries, out.reshape(shape)

    # -- checkpoint / resume ----------------------------------------------

    def checkpoint(self, carries, path: str) -> None:
        """Save the carry pytree (numpy .npz) for deterministic resume."""
        leaves, treedef = jax.tree.flatten(carries)
        np.savez(path, *[np.asarray(l) for l in leaves])

    def restore(self, path: str):
        """Load a carry pytree saved by :meth:`checkpoint`."""
        ref = self.init()
        leaves, treedef = jax.tree.flatten(ref)
        with np.load(path) as data:
            loaded = [data[k] for k in data.files]
        if len(loaded) != len(leaves):
            raise ValueError("checkpoint does not match pipeline structure")
        loaded = [jnp.asarray(l, dtype=r.dtype) for l, r in
                  zip(loaded, leaves)]
        return jax.tree.unflatten(treedef, loaded)

    def __repr__(self):
        stages = " >-> ".join(
            f"{op!r}[{n_in}->{n_out}]" for op, n_in, n_out in
            zip(self.ops, self.lens[:-1], self.lens[1:]))
        return f"Pipeline({stages})"
