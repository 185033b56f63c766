"""Worker process for tests/test_multiprocess.py.

argv: <coordinator_port> <process_id> <num_processes> <out_json>
Each process owns 4 CPU devices (XLA_FLAGS from the parent), joins the
jax.distributed cluster over localhost, assembles its contiguous slice of
the global batch via global_shard_batch, and runs one psum'd train step.
Replaces-the-reference capability: torch_utils/distributed.py:14-41
(init_process_group + DistributedSampler slicing).
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    port, pid, nproc, out = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    import _dist_common as C
    from adm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()  # all global devices, ('data', 'model')
    gb = C.global_batch()
    local = C.GLOBAL_BATCH // nproc
    sl = {k: v[pid * local:(pid + 1) * local] for k, v in gb.items()}
    loss, gnorm = C.run_one_step(mesh, sl)
    if pid == 0:
        Path(out).write_text(json.dumps({
            "loss": loss, "grad_norm": gnorm,
            "process_count": jax.process_count(),
            "global_devices": len(jax.devices()),
            "local_devices": len(jax.local_devices()),
        }))


if __name__ == "__main__":
    main()
