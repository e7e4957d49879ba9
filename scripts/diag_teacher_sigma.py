"""Diagnostic: is the distilled student's expansive Jacobian (sigma_max
1.128 on held-out clips, vs 0.743 shipped) inherited from the FFDNet
teacher, or imitation error?

Measures, on the same held-out clips eval_weights.py uses:
  * teacher sigma_max — FFDNet applied frame-wise (the operator the
    student was distilled toward);
  * student sigma_max (sanity, matches eval_weights);
  * teacher-student output distance on noisy clips (train-like inputs).

Runs on CPU so it can share the machine with TPU training jobs.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

FFDNET_CKPT = "/root/reference/model_zoo/ffdnet_color.pth"


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from adaptivepnp_sci_tpu.models.convert import load_ffdnet
    from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
    from adaptivepnp_sci_tpu.models.ffdnet import ffdnet_color
    from adaptivepnp_sci_tpu.train.datasets import synthetic_video_dataset
    from adaptivepnp_sci_tpu.train.trainer import load_checkpoint_variables
    from scripts.eval_weights import sigma_max_eval

    clips = jnp.asarray(synthetic_video_dataset(4, length=5, size=64, seed=9))
    key = jax.random.PRNGKey(0)

    ffd = ffdnet_color()
    ffd_vars = load_ffdnet(FFDNET_CKPT)

    class FrameWise:
        """FFDNet applied per frame of a (N, F, H, W, 3) clip — the same
        input signature sigma_max_eval expects, so the teacher's Jacobian
        is measured at exactly the student's probe points."""

        @staticmethod
        def apply(variables, x, sigma):
            n, f, h, w, c = x.shape
            s = jnp.repeat(jnp.broadcast_to(sigma, (n,)), f)
            out = ffd.apply(variables, x.reshape(n * f, h, w, c), s)
            return out.reshape(n, f, h, w, c)

    t_smax = sigma_max_eval(FrameWise, ffd_vars, clips, key)
    print(f"teacher (FFDNet frame-wise) sigma_max = {t_smax:.3f}")

    student = FastDVDnet()
    for path in sys.argv[1:] or ["weights/fastdvd_distill/final",
                                 "weights/fastdvd.npz"]:
        v = load_checkpoint_variables(path)
        s_smax = sigma_max_eval(student, v, clips, key)
        # teacher-student distance on train-like noisy inputs
        sig = jnp.full((clips.shape[0],), 20 / 255)
        noisy = clips + (20 / 255) * jax.random.normal(key, clips.shape)
        t_out = FrameWise.apply(ffd_vars, noisy, sig)[:, 2]
        s_out = student.apply(v, noisy, sig)
        d = float(jnp.sqrt(jnp.mean((t_out - s_out) ** 2)))
        print(f"{path}: sigma_max={s_smax:.3f}  rmse(student, teacher)={d:.4f}")


if __name__ == "__main__":
    main()
