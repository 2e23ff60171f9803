"""SPMD dispatch helpers for the Pallas kernels.

``pallas_call`` has no GSPMD partitioning rule: traced into a jit whose
operands are sharded across devices, the SPMD partitioner cannot split
it (it either errors or replicates the full-batch kernel on every
chip).  Every kernel in this package is batch-pointwise, so the correct
multi-device form is per-shard execution via ``shard_map`` over the
mesh's leading (data) axis — exact, and it keeps the kernel's VMEM
locality per chip.

Callers that trace under ``with Mesh(...):`` (the training step) use
:func:`ambient_mesh`; the serving driver enters its mesh context before
tracing so the same detection applies there.
"""

from __future__ import annotations


def ambient_mesh():
    """The active ``with Mesh(...):`` context mesh when it spans more
    than one device, else None."""
    try:
        from jax._src.mesh import thread_resources

        m = thread_resources.env.physical_mesh
        if m is not None and not m.empty and m.size > 1:
            return m
    except (ImportError, AttributeError):
        # private-API move: fail loudly where silence would mean
        # per-chip full-batch replication instead of per-shard dispatch
        import jax

        if jax.device_count() > 1:
            raise RuntimeError(
                "jax._src.mesh.thread_resources moved; Pallas SPMD "
                "mesh detection is broken — update ambient_mesh()")
    return None


def batch_shards(mesh) -> int:
    """Number of shards the leading batch axis splits into on ``mesh``."""
    return mesh.shape[mesh.axis_names[0]]


def shard_batch0(f, mesh, n_in: int, n_out: int = 1):
    """Wrap ``f`` (all operands and outputs batch-leading) in shard_map
    over ``mesh``'s first axis; other mesh axes replicate.

    ``check_vma=False``: the bodies carry custom_vjp kernels whose
    replication typing shard_map's checker cannot see through."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(mesh.axis_names[0])
    return shard_map(f, mesh=mesh, in_specs=(spec,) * n_in,
                     out_specs=spec if n_out == 1 else (spec,) * n_out,
                     check_vma=False)
