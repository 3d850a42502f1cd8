"""Generate the offline quality fixture: images + small trained checkpoints.

Creates ``tests/fixtures/quality/``:
  * three deterministic structured 128x128 HR images (gradients, edges,
    textures — enough spatial statistics for SR to beat bicubic) + their
    bicubic LR counterparts (ops/resize.py, torch-parity bicubic);
  * genuinely *trained* checkpoints (CPU, a few hundred Adam steps) saved
    through the registry scheme (best.model.ckpt + params.json) so the
    pretrained path — checkpoint load, numpy inference contract, PSNR
    floor — is testable with no network
    (tests/models/test_quality_fixture.py):
      - ESPCN x2 (the plain path),
      - SwinIR-tiny x4 and HAT-tiny x4 (round-3 VERDICT item 3: PSNR floors
        through the configurations actually benched — ``enable_fused(True)``,
        ``half()``, ``inference_tiled`` and ``hat_fast_forward`` — with x4
        classical tails and odd-window flip padding on the assertion path),
      - MaxSR-tiny x4 (fused Pallas attention + batch_stats registry
        round-trip), SwinFIR-tiny x4 (MXU-DFT SFB on the fused path),
      - SwinIR-tiny x2 and x3 (the single-shuffle fused tails; the x3 HR
        images are mod-cropped — 128 is not a x3 multiple).

Run once; outputs are committed. Deterministic (fixed seeds).

    python scripts/make_quality_fixture.py            # ESPCN x2
    python scripts/make_quality_fixture.py --swinir
    python scripts/make_quality_fixture.py --hat
    python scripts/make_quality_fixture.py --maxsr
    python scripts/make_quality_fixture.py --swinfir
    python scripts/make_quality_fixture.py --swinir-x2
    python scripts/make_quality_fixture.py --swinir-x3
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
# The env var alone does not reroute when sitecustomize pre-imported jax
# (the axon platform registers as "tpu"); pin the platform explicitly too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

FIXTURE_DIR = os.path.join("tests", "fixtures", "quality")


def make_images(n=3, size=128, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    images = []
    for i in range(n):
        img = np.zeros((size, size, 3), np.float32)
        # smooth background gradient
        for ch in range(3):
            a, b, c = rng.uniform(-1, 1, 3)
            img[..., ch] = 0.5 + 0.3 * (a * xx + b * yy + c * xx * yy)
        # sinusoidal texture patches (high frequencies: where bicubic fails)
        for _ in range(8):
            fx, fy = rng.uniform(4, 28, 2)
            phase = rng.uniform(0, 6.28)
            amp = rng.uniform(0.05, 0.15)
            tex = amp * np.sin(2 * np.pi * (fx * xx + fy * yy) + phase)
            img += tex[..., None] * rng.uniform(0.3, 1.0, 3)
        # hard-edged shapes (rectangles + circles)
        for _ in range(18):
            x0, y0 = rng.integers(0, size - 24, 2)
            w, h = rng.integers(8, 48, 2)
            color = rng.uniform(0, 1, 3).astype(np.float32)
            if rng.random() < 0.5:
                img[y0 : y0 + h, x0 : x0 + w] = 0.6 * img[y0 : y0 + h, x0 : x0 + w] + 0.4 * color
            else:
                cy, cx, r = y0 + h // 2, x0 + w // 2, min(w, h) // 2
                m = (yy * size - cy) ** 2 + (xx * size - cx) ** 2 <= r * r
                img[m] = 0.5 * img[m] + 0.5 * color
        # mild filtered noise
        noise = rng.standard_normal((size // 4, size // 4, 3)).astype(np.float32)
        noise = np.repeat(np.repeat(noise, 4, 0), 4, 1) * 0.02
        img = np.clip(img + noise, 0, 1)
        images.append((img * 255.0).round().astype(np.uint8))
    return images


def make_fixture(
    build_model,
    tag: str,
    ckpt_subdir: str,
    *,
    scale: int,
    seed: int,
    iters: int,
    crop: int,
    batch: int,
    lr_suffix: str,
    write_hr: bool = False,
) -> None:
    """Train one fixture model on the deterministic images and save it
    through the registry checkpoint scheme.

    ``crop`` is the LR crop (a window multiple for the transformer models);
    ``lr_suffix`` names the LR pngs (``_lr`` for the original ESPCN x2
    fixture, ``_lrx{scale}`` for the per-scale transformer fixtures — the
    x4 fixtures share one set of LR images, re-written identically since
    make_images is deterministic)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import serialization

    from studiosr_tpu.ops.resize import bicubic_resize
    from studiosr_tpu.utils.helpers import imwrite
    from studiosr_tpu.utils.metrics import compute_psnr

    ckpt_dir = os.path.join(FIXTURE_DIR, ckpt_subdir)
    os.makedirs(ckpt_dir, exist_ok=True)
    # Mod-crop the HR to a scale multiple (128 is not divisible by 3) —
    # otherwise the LR is not an exact x-scale downscale and every training
    # pair is geometrically skewed. Tests mod-crop the stored HR the same way.
    hrs = [hr[: hr.shape[0] // scale * scale, : hr.shape[1] // scale * scale] for hr in make_images()]
    lrs = []
    for i, hr in enumerate(hrs):
        lr = np.asarray(
            bicubic_resize(
                jnp.asarray(hr.astype(np.float32) / 255.0)[None], hr.shape[0] // scale, hr.shape[1] // scale
            )
        )[0]
        lr = np.clip(np.round(lr * 255.0), 0, 255).astype(np.uint8)
        lrs.append(lr)
        if write_hr:
            imwrite(os.path.join(FIXTURE_DIR, f"img{i}_hr.png"), hr)
        imwrite(os.path.join(FIXTURE_DIR, f"img{i}{lr_suffix}.png"), lr)

    model = build_model()
    tx = optax.adam(optax.cosine_decay_schedule(2e-3, iters))
    params = model.variables["params"]
    batch_stats = model.variables.get("batch_stats", {})
    opt_state = tx.init(params)
    module = model.module

    def loss_fn(p, bs, lq, gt):
        if bs:
            out, mut = module.apply({"params": p, "batch_stats": bs}, lq, train=True, mutable=["batch_stats"])
            return jnp.mean(jnp.abs(out - gt)), mut["batch_stats"]
        return jnp.mean(jnp.abs(module.apply({"params": p}, lq, train=True) - gt)), bs

    @jax.jit
    def step(p, bs, o, lq, gt):
        (l, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bs, lq, gt)
        up, o = tx.update(g, o)
        return optax.apply_updates(p, up), bs, o, l

    rng = np.random.default_rng(seed)
    for it in range(iters):
        lq_b, gt_b = [], []
        for _ in range(batch):
            i = rng.integers(len(hrs))
            y = rng.integers(0, lrs[i].shape[0] - crop)
            x = rng.integers(0, lrs[i].shape[1] - crop)
            lq_c = lrs[i][y : y + crop, x : x + crop].astype(np.float32) / 255.0
            gt_c = hrs[i][y * scale : (y + crop) * scale, x * scale : (x + crop) * scale].astype(np.float32) / 255.0
            # paired flip/rot90 augmentation (the reference recipe) — also
            # makes the model ~equivariant so self-ensemble TTA helps.
            if rng.random() < 0.5:
                lq_c, gt_c = lq_c[:, ::-1], gt_c[:, ::-1]
            if rng.random() < 0.5:
                lq_c, gt_c = lq_c[::-1], gt_c[::-1]
            k = int(rng.integers(4))
            lq_c, gt_c = np.rot90(lq_c, k), np.rot90(gt_c, k)
            lq_b.append(np.ascontiguousarray(lq_c))
            gt_b.append(np.ascontiguousarray(gt_c))
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, jnp.asarray(np.stack(lq_b)), jnp.asarray(np.stack(gt_b))
        )
        if it % 250 == 0:
            print(f"{tag} iter {it}: loss {float(loss):.5f}", flush=True)

    model.variables = {"params": jax.device_get(params)}
    if batch_stats:
        model.variables["batch_stats"] = jax.device_get(batch_stats)
    with open(os.path.join(ckpt_dir, "best.model.ckpt"), "wb") as f:
        f.write(serialization.to_bytes(model.variables))
    with open(os.path.join(ckpt_dir, "params.json"), "w") as f:
        json.dump(model.config, f)

    for i, (hr, lr) in enumerate(zip(hrs, lrs)):
        sr = model.inference(lr)
        up = np.asarray(
            bicubic_resize(jnp.asarray(lr.astype(np.float32) / 255.0)[None], hr.shape[0], hr.shape[1])
        )[0]
        up = np.clip(np.round(up * 255.0), 0, 255).astype(np.uint8)
        print(
            f"img{i}: {tag} psnr {compute_psnr(sr, hr):.2f} dB  "
            f"bicubic psnr {compute_psnr(up, hr):.2f} dB"
        )


def main() -> None:
    from studiosr_tpu.models import ESPCN

    make_fixture(
        lambda: ESPCN.build(scale=2, channels=64),
        "ESPCN", "ckpt",
        scale=2, seed=0, iters=2000, crop=24, batch=16, lr_suffix="_lr", write_hr=True,
    )


def make_swinir_fixture(iters: int = 1500) -> None:
    from studiosr_tpu.models import SwinIR

    make_fixture(
        lambda: SwinIR.build(
            scale=4, embed_dim=32, depths=[2, 2], num_heads=[2, 2],
            window_size=8, mlp_ratio=2.0, drop_path_rate=0.0,
        ),
        "SwinIR-tiny x4", "swinir_ckpt",
        scale=4, seed=1, iters=iters, crop=16, batch=8, lr_suffix="_lrx4",
    )


def make_hat_fixture(iters: int = 1500) -> None:
    from studiosr_tpu.models import HAT

    make_fixture(
        lambda: HAT.build(
            scale=4, embed_dim=32, depths=[2, 2], num_heads=[2, 2],
            window_size=8, mlp_ratio=2.0, drop_path_rate=0.0,
        ),
        "HAT-tiny x4", "hat_ckpt",
        scale=4, seed=2, iters=iters, crop=16, batch=8, lr_suffix="_lrx4",
    )


def make_swinir_s_fixture(scale: int, iters: int = 1500) -> None:
    """SwinIR-tiny at x2/x3: trained-weights floors for the single-shuffle
    fused tails (ops/pallas/upsampler.fused_upsample_s) built in round 3."""
    from studiosr_tpu.models import SwinIR

    make_fixture(
        lambda: SwinIR.build(
            scale=scale, embed_dim=32, depths=[2, 2], num_heads=[2, 2],
            window_size=8, mlp_ratio=2.0, drop_path_rate=0.0,
        ),
        f"SwinIR-tiny x{scale}", f"swinir_x{scale}_ckpt",
        scale=scale, seed=4 + scale, iters=iters, crop=16, batch=8, lr_suffix=f"_lrx{scale}",
    )


def make_hat_s_fixture(scale: int, iters: int = 1500) -> None:
    """HAT-tiny at x2/x3: trained-weights floors for hat_fast's
    single-shuffle fused tail + scale-dependent prep/tail selection."""
    from studiosr_tpu.models import HAT

    make_fixture(
        lambda: HAT.build(
            scale=scale, embed_dim=32, depths=[2, 2], num_heads=[2, 2],
            window_size=8, mlp_ratio=2.0, drop_path_rate=0.0,
        ),
        f"HAT-tiny x{scale}", f"hat_x{scale}_ckpt",
        scale=scale, seed=8 + scale, iters=iters, crop=16, batch=8, lr_suffix=f"_lrx{scale}",
    )


def make_swinfir_fixture(iters: int = 1500) -> None:
    from studiosr_tpu.models import SwinFIR

    make_fixture(
        lambda: SwinFIR.build(
            scale=4, embed_dim=32, depths=[2, 2], num_heads=[2, 2],
            window_size=8, mlp_ratio=2.0, drop_path_rate=0.0,
        ),
        "SwinFIR-tiny x4", "swinfir_ckpt",
        scale=4, seed=4, iters=iters, crop=16, batch=8, lr_suffix="_lrx4",
    )


def make_maxsr_fixture(iters: int = 1500) -> None:
    from studiosr_tpu.models import MaxSR

    make_fixture(
        lambda: MaxSR.build(
            scale=4, adaptive=True, dim=32, dim_head=16, depth=[2, 2],
            window_size=8, dropout=0.0,
        ),
        "MaxSR-tiny x4", "maxsr_ckpt",
        scale=4, seed=3, iters=iters, crop=16, batch=8, lr_suffix="_lrx4",
    )


def make_swinir_x8_fixture(iters: int = 1500) -> None:
    """SwinIR-tiny x8: trained-weights floor for the log2 upsample ladder
    (models/blocks.py Upsampler, reference common.py:130-133) — the one
    driver scale with no fused tail: fused serving must DECLINE the tail
    cleanly at s=8 (serving/swinir_fast.py) and still hold quality.
    LR images are 16x16; the LR crop is one 8-window."""
    from studiosr_tpu.models import SwinIR

    make_fixture(
        lambda: SwinIR.build(
            scale=8, embed_dim=32, depths=[2, 2], num_heads=[2, 2],
            window_size=8, mlp_ratio=2.0, drop_path_rate=0.0,
        ),
        "SwinIR-tiny x8", "swinir_x8_ckpt",
        scale=8, seed=16, iters=iters, crop=8, batch=8, lr_suffix="_lrx8",
    )


def make_rcan_fixture(iters: int = 2000) -> None:
    """RCAN-tiny x4: trained-weights floor for the conv-family linen/XLA
    serving path with the channel-attention gate (round 4 — the conv
    models previously had golden parity but no trained quality floor)."""
    from studiosr_tpu.models import RCAN

    make_fixture(
        lambda: RCAN.build(scale=4, n_feats=24, n_resblocks=2, n_resgroups=2),
        "RCAN-tiny x4", "rcan_ckpt",
        scale=4, seed=12, iters=iters, crop=16, batch=8, lr_suffix="_lrx4",
    )


def make_edsr_fixture(iters: int = 2000) -> None:
    """EDSR-tiny x4: trained-weights floor for the plain residual conv
    trunk (the zoo-backed family, reference edsr.py:77-112 — round-4
    VERDICT: golden parity existed but no trained floor). res_scale=1.0:
    at 2 resblocks the published 0.1 damping only slows convergence."""
    from studiosr_tpu.models import EDSR

    make_fixture(
        lambda: EDSR.build(scale=4, n_feats=24, n_resblocks=2, res_scale=1.0),
        "EDSR-tiny x4", "edsr_ckpt",
        scale=4, seed=14, iters=iters, crop=16, batch=8, lr_suffix="_lrx4",
    )


def make_han_fixture(iters: int = 2000) -> None:
    """HAN-tiny x4: trained-weights floor through the default banded-CSAM
    gate (models/han.py CSAM_IMPL="banded" — the round-3 reformulation
    needed trained-weight evidence, not only random-kernel equivalence)
    plus the LAM einsum head. Reference zoo path: han.py:145-158."""
    from studiosr_tpu.models import HAN

    make_fixture(
        lambda: HAN.build(scale=4, n_feats=24, n_resblocks=2, n_resgroups=2, reduction=4),
        "HAN-tiny x4", "han_ckpt",
        scale=4, seed=15, iters=iters, crop=16, batch=8, lr_suffix="_lrx4",
    )


def make_han_x8_fixture(iters: int = 2000) -> None:
    """HAN-tiny x8: the reference's zoo uniquely includes a scale-8 HAN
    (han.py:148 file_ids {2,3,4,8}) — trained floor for the conv-family
    log2 upsample ladder at x8."""
    from studiosr_tpu.models import HAN

    make_fixture(
        lambda: HAN.build(scale=8, n_feats=24, n_resblocks=2, n_resgroups=2, reduction=4),
        "HAN-tiny x8", "han_x8_ckpt",
        scale=8, seed=20, iters=iters, crop=8, batch=8, lr_suffix="_lrx8",
    )


def make_vdsr_fixture(iters: int = 2000) -> None:
    """VDSR-tiny x2: trained-weights floor for the bicubic-upscale-then-
    residual-refine contract (reference vdsr.py:75-93 zoo path)."""
    from studiosr_tpu.models import VDSR

    make_fixture(
        lambda: VDSR.build(scale=2, channels=32, n_layers=8),
        "VDSR-tiny x2", "vdsr_ckpt",
        scale=2, seed=17, iters=iters, crop=24, batch=8, lr_suffix="_lrx2",
    )


def make_srcnn_fixture(iters: int = 2000) -> None:
    """SRCNN x2 (the full published arch — it is already tiny): trained
    floor for the oldest family's interpolate-then-refine contract."""
    from studiosr_tpu.models import SRCNN

    make_fixture(
        lambda: SRCNN.build(scale=2),
        "SRCNN x2", "srcnn_ckpt",
        scale=2, seed=18, iters=iters, crop=24, batch=8, lr_suffix="_lrx2",
    )


def make_srresnet_fixture(iters: int = 2000) -> None:
    """SRResNet-tiny x4: trained floor for the BatchNorm trunk — the only
    conv family carrying batch_stats through the registry round-trip."""
    from studiosr_tpu.models import SRResNet

    make_fixture(
        lambda: SRResNet.build(scale=4, channels=24, num_rcb=2),
        "SRResNet-tiny x4", "srresnet_ckpt",
        scale=4, seed=19, iters=iters, crop=16, batch=8, lr_suffix="_lrx4",
    )


def make_imdn_fixture(iters: int = 2000) -> None:
    """IMDN-tiny x4: trained-weights floor for the channel-split
    distillation trunk + CCA contrast gate."""
    from studiosr_tpu.models import IMDN

    make_fixture(
        lambda: IMDN.build(scale=4, n_feats=24, n_modules=6),
        "IMDN-tiny x4", "imdn_ckpt",
        scale=4, seed=13, iters=iters, crop=16, batch=8, lr_suffix="_lrx4",
    )


if __name__ == "__main__":
    if "--swinir" in sys.argv:
        make_swinir_fixture()
    elif "--hat" in sys.argv:
        make_hat_fixture()
    elif "--maxsr" in sys.argv:
        make_maxsr_fixture()
    elif "--swinfir" in sys.argv:
        make_swinfir_fixture()
    elif "--swinir-x2" in sys.argv:
        make_swinir_s_fixture(2)
    elif "--swinir-x3" in sys.argv:
        make_swinir_s_fixture(3)
    elif "--hat-x2" in sys.argv:
        make_hat_s_fixture(2)
    elif "--hat-x3" in sys.argv:
        make_hat_s_fixture(3)
    elif "--rcan" in sys.argv:
        make_rcan_fixture()
    elif "--imdn" in sys.argv:
        make_imdn_fixture()
    elif "--edsr" in sys.argv:
        make_edsr_fixture()
    elif "--han-x8" in sys.argv:
        make_han_x8_fixture()
    elif "--han" in sys.argv:
        make_han_fixture()
    elif "--vdsr" in sys.argv:
        make_vdsr_fixture()
    elif "--srcnn" in sys.argv:
        make_srcnn_fixture()
    elif "--srresnet" in sys.argv:
        make_srresnet_fixture()
    elif "--swinir-x8" in sys.argv:
        make_swinir_x8_fixture()
    else:
        main()
