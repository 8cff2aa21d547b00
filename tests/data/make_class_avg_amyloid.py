"""Generator for class_avg_amyloid.npy (committed fixture).

EMPIAR-10940-style amyloid class average (the reference app's demo
dataset is EMPIAR-10940 / EMD-14046, app.py:136-141): helical diameter
~100 A, rise 4.75 A, left-handed twist 2.0 deg, apix 2.0, band-limited
to 8 A and degraded with 30% foreground-sigma Gaussian noise.
Deterministic (seeded); re-running reproduces the committed bytes.
"""

import numpy as np


def main(out="class_avg_amyloid.npy"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import helicon_tpu as ht
    from helicon_tpu.helix import simulate_helical_projection

    rng = np.random.default_rng(42)
    img = np.squeeze(np.asarray(simulate_helical_projection(
        n=1, twist=-2.0, rise=4.75, csym=1, helical_diameter=100.0,
        ball_radius=4.0, polymer=1, planarity=0.7, ny=64, nx=256,
        apix=2.0, rng=3,
    )))
    img = np.asarray(
        ht.low_high_pass_filter(img, low_pass_fraction=2 * 2.0 / 8.0)
    )
    sig = img[np.abs(img) > 1e-4].std()
    img = (img + rng.normal(scale=0.3 * sig, size=img.shape)).astype(
        np.float32
    )
    np.save(out, img)
    print("wrote", out, img.shape)


if __name__ == "__main__":
    main()
