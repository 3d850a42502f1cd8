"""End-to-end Trainer.run() validation ON the real TPU backend.

    python scripts/exp_trainer_tpu_e2e.py

The CPU suite covers Trainer end-to-end (tests/engine/test_trainer.py);
training THROUGHPUT on the chip is measured by exp_train_step.py. This
drives the remaining gap: the full production loop — prefetch loader,
fused-train auto-enable, jitted step, periodic eval through the serving
path, checkpoint save, EMA shadow, resume-from-latest — once on the real
backend. SwinIR-tiny at the driver crop shape; synthetic paired data
(box-downsampled), so it runs offline. Expect a few minutes (two train-step
compiles: fresh + resume).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class SyntheticPairs:
    def __init__(self, n: int = 64, size: int = 64, scale: int = 4):
        import numpy as np

        rng = np.random.default_rng(0)
        self.gt = rng.random((n, size * scale, size * scale, 3), dtype=np.float32)
        self.lq = self.gt.reshape(n, size, scale, size, scale, 3).mean(axis=(2, 4)).astype(np.float32)

    def __len__(self):
        return len(self.gt)

    def __getitem__(self, idx):
        return self.lq[idx], self.gt[idx]


class SmokeEvaluator:
    """Drives model.inference (the uint8 serving contract) once per eval."""

    def __init__(self):
        import numpy as np

        self.calls = 0
        self.img = (np.random.default_rng(1).random((48, 48, 3)) * 255).astype(np.uint8)

    def run(self, func):
        self.calls += 1
        out = func(self.img)
        assert out.shape == (192, 192, 3), out.shape
        return 30.0 + self.calls, 0.9


def main() -> None:
    import jax

    from studiosr_tpu.engine import Trainer
    from studiosr_tpu.models import SwinIR
    from studiosr_tpu.utils.helpers import enable_compilation_cache
    from studiosr_tpu.zoo.registry import load_model

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}", flush=True)

    ckpt = "/tmp/tpu_e2e_ckpt"
    shutil.rmtree(ckpt, ignore_errors=True)

    def build():
        return SwinIR.build(
            scale=4, embed_dim=32, depths=[2, 2], num_heads=[2, 2],
            window_size=8, mlp_ratio=2.0, drop_path_rate=0.0, fast_init=True,
        )

    dataset = SyntheticPairs()
    ev = SmokeEvaluator()
    kwargs = dict(
        batch_size=8, num_workers=2, max_iters=40, eval_interval=20,
        milestones=[30], ckpt_path=ckpt, log_interval=10, ema_decay=0.999,
    )

    t0 = time.perf_counter()
    trainer = Trainer(build(), dataset, ev, **kwargs)
    assert trainer.fused_train, "fused_train should auto-enable on TPU"
    trainer.run()
    print(f"run 1: {time.perf_counter() - t0:.0f}s, evals {ev.calls}, best {trainer.best_psnr}", flush=True)
    for f in ("best.model.ckpt", "latest.train.ckpt", "latest.ema.ckpt", "params.json", "train.log"):
        assert os.path.exists(os.path.join(ckpt, f)), f

    # resume-from-latest: 20 more iterations continue the schedule
    t0 = time.perf_counter()
    trainer2 = Trainer(build(), dataset, ev, **{**kwargs, "max_iters": 60})
    trainer2.run()
    assert int(trainer2.state.step) == 60, int(trainer2.state.step)
    print(f"resume: {time.perf_counter() - t0:.0f}s, evals {ev.calls}", flush=True)

    # the checkpoint serves through the fused path
    m = load_model(ckpt, "swinir", tag="best")
    m.half().enable_fused(True)
    out = m.inference(ev.img)
    assert out.shape == (192, 192, 3)

    # Chip-resident eval route (round 4): with one of OUR evaluators the
    # Trainer defaults to the one-program pair eval on TPU — verify the
    # auto-selection and host-protocol agreement on the real chip.
    import numpy as np

    from studiosr_tpu.data import PairedImageDataset
    from studiosr_tpu.engine.evaluator import Evaluator2
    from studiosr_tpu.utils.helpers import imwrite

    evroot = "/tmp/tpu_e2e_eval"
    shutil.rmtree(evroot, ignore_errors=True)
    hr_dir = os.path.join(evroot, "HR")
    lr_dir = os.path.join(evroot, "LR_bicubic", "X4")
    os.makedirs(hr_dir), os.makedirs(lr_dir)
    for i in range(2):
        imwrite(os.path.join(hr_dir, f"im{i}.png"), (dataset.gt[i] * 255).astype(np.uint8))
        imwrite(os.path.join(lr_dir, f"im{i}.png"), (dataset.lq[i] * 255).astype(np.uint8))
    ev2 = Evaluator2.__new__(Evaluator2)
    ev2.dataset, ev2.scale, ev2.root = "fixture", 4, evroot
    ev2.testset = PairedImageDataset(hr_dir, lr_dir)
    trainer2.evaluator = ev2
    assert trainer2._eval_on_device(), "our evaluator on TPU must take the on-device route"
    dev_psnr, dev_ssim = trainer2.evaluate()
    host_psnr, host_ssim = ev2.run(trainer2.model.inference)
    d_psnr, d_ssim = abs(dev_psnr - host_psnr), abs(dev_ssim - host_ssim)
    print(f"on-device eval: {dev_psnr:.4f}/{dev_ssim:.5f} host: {host_psnr:.4f}/{host_ssim:.5f}", flush=True)
    assert d_psnr < 1e-3 and d_ssim < 1e-3, (d_psnr, d_ssim)
    print("TPU end-to-end Trainer: OK", flush=True)


if __name__ == "__main__":
    main()
