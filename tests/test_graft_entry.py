"""The driver-facing contract: dryrun_multichip must run one sharded step.

Round-1 regression: the dryrun initialized the real-TPU backend instead of
forcing a CPU mesh and crashed before running a step (VERDICT.md missing #1).
Under pytest the conftest already provides 8 virtual CPU devices, so the
force path is a no-op and the dryrun must simply work.
"""

import pytest

import __graft_entry__


@pytest.mark.slow  # ~20 min on 1 CPU: the driver runs dryrun(8) every
def test_dryrun_multichip_8():  # round anyway (MULTICHIP_r*.json)
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.heavy
def test_dryrun_multichip_2():
    __graft_entry__.dryrun_multichip(2)


def test_shard_batch_is_global_assembly():
    """shard_batch must build the global array from process-local data.

    With one process the local slice IS the global batch; the result must
    equal a plain sharded device_put and carry the 'data'-axis sharding
    (multi-host correctness is the same API with per-process slices,
    jax.make_array_from_process_local_data).
    """
    import jax
    import numpy as np
    from jax.sharding import PartitionSpec as P
    from speech2lip_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                              shard_batch)

    mesh = make_mesh((8, 1))
    batch = {"a": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
             "b": np.ones((8, 2, 2), np.int32)}
    out = shard_batch(batch, mesh)
    ref = jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
    for k in batch:
        assert out[k].sharding.spec == P("data")
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]))
