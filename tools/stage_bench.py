"""Per-stage timing of the real-size RFT step (debug tool for bench.py)."""
import time

import jax
from vla_rft_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np

from vla_rft_tpu.config import vla_rft_default_config
from vla_rft_tpu.parallel.mesh import MeshConfig, make_mesh
from vla_rft_tpu.trainer.grpo_trainer import VLARFTGRPOTrainer


def main(B_unique=2, n=16):
    c = vla_rft_default_config()
    c.data.train_batch_size = B_unique
    c.actor_rollout_ref.rollout.n = n
    c.actor_rollout_ref.actor.ppo_mini_batch_size = 16
    c.actor_rollout_ref.actor.ppo_micro_batch_size_per_gpu = 8
    c.actor_rollout_ref.rollout.log_prob_micro_batch_size_per_gpu = 16
    c.trainer.logger = []
    import os as _os
    c.world_model_rollout.rollout.micro_batch_size = int(_os.environ.get("WM_MB", "16"))
    c.mesh = {"dp": 1, "fsdp": 1, "tp": 1, "sp": 1}
    mesh = make_mesh(MeshConfig(dp=1), devices=jax.devices()[:1])

    t0 = time.time()
    trainer = VLARFTGRPOTrainer(c, preset="libero", mesh=mesh)
    print(f"[init] {time.time()-t0:.1f}s", flush=True)

    batch = trainer.dataset.next_batch()
    for it in range(2):
        t0 = time.time()
        m = trainer.training_step(batch, jax.random.key(it))
        dt = time.time() - t0
        timing = {k.split("/")[-1]: round(float(v), 2) for k, v in m.items() if "timing" in k}
        print(f"[step {it}] total {dt:.1f}s timing={timing}", flush=True)
    print("reward:", m.get("critic/rewards/mean"), "pg:", m.get("actor/pg_loss"))


if __name__ == "__main__":
    main()
