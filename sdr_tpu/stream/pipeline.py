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

from typing import Iterable, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from sdr_tpu.stream.block import StreamOp

__all__ = ["Pipeline", "pack_planar", "unpack_planar"]


def _planarize(leaf):
    """complex64 [..., n] -> planar float32 [2, ..., n] (TPU-native layout:
    complex never appears in loop-carried buffers — XLA decomposes complex
    math anyway, and some TPU runtimes reject complex loop state)."""
    if jnp.iscomplexobj(leaf):
        return jnp.stack([jnp.real(leaf), jnp.imag(leaf)], axis=0)
    return leaf


def _unplanarize(leaf, was_complex: bool):
    if was_complex:
        return jax.lax.complex(leaf[0], leaf[1])
    return leaf


def pack_planar(tree):
    """Convert every complex leaf of a pytree to planar f32; returns
    (packed_tree, flags) where flags records which leaves were complex."""
    leaves, treedef = jax.tree.flatten(tree)
    flags = tuple(bool(jnp.iscomplexobj(l)) for l in leaves)
    packed = jax.tree.unflatten(treedef, [_planarize(l) for l in leaves])
    return packed, flags


def unpack_planar(packed, flags):
    leaves, treedef = jax.tree.flatten(packed)
    return jax.tree.unflatten(
        treedef, [_unplanarize(l, f) for l, f in zip(leaves, flags)])


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

        All loop-carried buffers are kept in planar-f32 form (complex
        split into a leading [2, ...] axis): the TPU-native layout, and
        required on runtimes that reject complex64 in loop state.
        """
        if carries is None:
            carries = self.init()
        carries_p, cflags = pack_planar(carries)
        xs_complex = bool(jnp.iscomplexobj(blocks))
        if xs_complex:
            blocks = jnp.stack([jnp.real(blocks), jnp.imag(blocks)], axis=1)
        yflags = None

        def step(c_p, xb):
            c = unpack_planar(c_p, cflags)
            if xs_complex:
                xb = jax.lax.complex(xb[0], xb[1])
            c, y = self.apply(c, xb)
            c_p, _ = pack_planar(c)
            y_p, yf = pack_planar(y)
            nonlocal yflags
            yflags = yf
            return c_p, y_p

        final_p, ys_p = jax.lax.scan(step, carries_p, blocks)
        final = unpack_planar(final_p, cflags)
        # ys leaves: stacked [nb, ...]; complex ones carry the planar axis
        # at position 1 -> recombine
        leaves, treedef = jax.tree.flatten(ys_p)
        leaves = [jax.lax.complex(l[:, 0], l[:, 1]) if f else l
                  for l, f in zip(leaves, yflags)]
        ys = jax.tree.unflatten(treedef, leaves)
        return final, ys

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
        if jax.default_backend() == "axon":
            # the axon-tunneled TPU runtime miscompiles some scan-wrapped
            # chains (see .claude/skills/verify/SKILL.md); drive with the
            # jitted per-block step instead — same samples, same speed.
            if carries is None:
                carries = self.init()
            step = jax.jit(self.apply)
            out_blocks = []
            for i in range(nblocks):
                carries, y = step(carries, blocks[i])
                out_blocks.append(y)
            ys = jnp.stack(out_blocks, axis=0)
            return carries, self._restack(ys, lead)
        carries, ys = self.scan(blocks, carries)
        return carries, self._restack(ys, lead)

    @staticmethod
    def _restack(ys, lead):
        """[nblocks, *lead, ...per-block] -> [*lead, stream, ...]"""
        per_block = ys.ndim - 1 - len(lead)
        stream_axis = ys.ndim - per_block  # first per-block axis
        out = jnp.moveaxis(ys, 0, stream_axis - 1)
        shape = (out.shape[: stream_axis - 1]
                 + (out.shape[stream_axis - 1] * out.shape[stream_axis],)
                 + out.shape[stream_axis + 1:])
        return out.reshape(shape)

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
