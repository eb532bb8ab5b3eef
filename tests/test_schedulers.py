"""Scheduler math tests: table construction, DDIM invertibility, DDPM
trajectory extraction, elementwise eta."""

import jax
import jax.numpy as jnp
import numpy as np

from eta_inversion_tpu.schedulers import (
    DiffusionSchedule,
    ScheduleConfig,
    ddim_backward_step,
    ddim_inverse_step,
    ddim_step,
    ddpm_inverse_step,
    sample_trajectory,
)


def make_schedule(steps=50):
    return DiffusionSchedule(ScheduleConfig(), steps)


def test_tables_match_diffusers_constants():
    s = make_schedule()
    # endpoints of the scaled_linear beta schedule used by SD
    assert np.isclose(float(s.betas[0]), 0.00085, atol=1e-8)
    assert np.isclose(float(s.betas[-1]), 0.012, atol=1e-8)
    assert np.isclose(float(s.alphas_cumprod[0]), 1 - 0.00085, atol=1e-7)
    # set_alpha_to_one=False -> final alpha is alphas_cumprod[0]
    assert np.isclose(float(s.final_alpha_cumprod), float(s.alphas_cumprod[0]))
    ts = s.timesteps_backward
    assert ts[0] == 980 and ts[-1] == 0 and len(ts) == 50
    fwd = s.timesteps_forward()
    assert fwd[0] == 0 and fwd[-1] == 980
    assert (s.timesteps_forward("shiftshift") == fwd - 20).all()


def test_alpha_at_negative_t():
    s = make_schedule()
    assert np.isclose(float(s.alpha_at(-20)), float(s.final_alpha_cumprod))
    assert np.isclose(float(s.alpha_at(5)), float(s.alphas_cumprod[5]))


def test_ddim_roundtrip_exact_with_constant_eps():
    """With the same eps used in both directions, DDIM inversion is the exact
    inverse of the DDIM backward step."""
    s = make_schedule(10)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 8, 8, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    t = jnp.asarray(500)
    # forward step t-100 -> t then backward t -> t-100
    x_up = ddim_step(s, x, eps, t - 100, t)
    x_rec = ddim_step(s, x_up, eps, t, t - 100)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=2e-5, atol=2e-5)


def test_ddim_backward_matches_generic_step_eta0():
    s = make_schedule(50)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.asarray(500)
    a = ddim_backward_step(s, x, eps, t, eta=0.0)
    b = ddim_step(s, x, eps, t, t - 20)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_ddim_backward_elementwise_eta():
    """Per-pixel eta: zero-eta pixels must match the deterministic step even
    when a noise tensor is supplied."""
    s = make_schedule(50)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    t = jnp.asarray(500)
    eta = jnp.zeros((1, 8, 8, 1)).at[:, :4].set(1.0)
    out = ddim_backward_step(s, x, eps, t, eta=eta, noise=noise)
    det = ddim_backward_step(s, x, eps, t, eta=0.0)
    np.testing.assert_allclose(np.asarray(out[:, 4:]), np.asarray(det[:, 4:]),
                               rtol=1e-6, atol=1e-6)
    assert not np.allclose(np.asarray(out[:, :4]), np.asarray(det[:, :4]))


def test_ddim_inverse_modes():
    s = make_schedule(50)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    eps = jnp.zeros_like(x)
    t = jnp.asarray(100)
    a = ddim_inverse_step(s, x, eps, t, "sameshift")
    b = ddim_inverse_step(s, x, eps, t, "samesame")
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_dpm_timestep_grids():
    from eta_inversion_tpu.schedulers.dpm import (
        dpm_timesteps_backward,
        dpm_timesteps_forward,
    )

    s = make_schedule(50)
    bwd = dpm_timesteps_backward(s)
    assert bwd[0] == 999 and bwd[-1] == 20 and len(bwd) == 50
    # inverse grid starts at 0 (reference assert, ..._inverse.py:60)
    fwd = dpm_timesteps_forward(s)
    assert fwd[0] == 0 and fwd[-1] == 979 and len(fwd) == 50
    fwd2 = dpm_timesteps_forward(s, "shiftshift")
    assert fwd2[0] == -20 and fwd2[-1] == 959


def test_dpm_first_step_is_first_order():
    """With empty multistep state the update must equal the closed-form
    first-order dpmsolver++ step."""
    from eta_inversion_tpu.schedulers.dpm import (
        convert_eps_to_x0,
        dpm_init_state,
        dpm_step,
    )

    s = make_schedule(10)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    t, prev_t = jnp.asarray(999), jnp.asarray(899)
    state = dpm_init_state(x.shape)
    out, new_state = dpm_step(s, state, x, eps, t, prev_t, jnp.asarray(False),
                              False)

    a_p = jnp.sqrt(s.alpha_at(prev_t))
    sg_p = jnp.sqrt(1 - s.alpha_at(prev_t))
    sg_t = jnp.sqrt(1 - s.alpha_at(t))
    lam = lambda tt: jnp.log(jnp.sqrt(s.alpha_at(tt))) - jnp.log(jnp.sqrt(1 - s.alpha_at(tt)))
    h = lam(prev_t) - lam(t)
    x0 = convert_eps_to_x0(s, x, eps, t)
    expected = (sg_p / sg_t) * x - a_p * (jnp.exp(-h) - 1) * x0
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5)
    assert int(new_state["dpm_low"]) == 1
    np.testing.assert_allclose(np.asarray(new_state["dpm_m_prev"]), np.asarray(x0))


def test_dpm_third_order():
    """Order-3 update: degenerate with equal model outputs (D1=D2=0 -> equals
    first order exactly), nontrivial otherwise, and warmup-gated."""
    from eta_inversion_tpu.schedulers.dpm import (
        convert_eps_to_x0,
        dpm_init_state,
        dpm_step,
    )

    s = make_schedule(20)  # >= 15 steps: no lower_order_final ramp-down
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 8, 8, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    t, prev_t = jnp.asarray(500), jnp.asarray(450)

    # warmed state with both previous x0 predictions equal to this step's
    m0 = convert_eps_to_x0(s, x, eps, t)
    state = dpm_init_state(x.shape)
    state.update(dpm_m_prev=m0, dpm_t_prev=jnp.asarray(550, jnp.int32),
                 dpm_m_prev2=m0, dpm_t_prev2=jnp.asarray(600, jnp.int32),
                 dpm_low=jnp.asarray(3, jnp.int32))
    out3, st3 = dpm_step(s, state, x, eps, t, prev_t, jnp.asarray(False),
                         jnp.asarray(False), solver_order=3)
    out1, _ = dpm_step(s, state, x, eps, t, prev_t, jnp.asarray(False),
                       jnp.asarray(False), solver_order=1)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st3["dpm_m_prev2"]),
                               np.asarray(state["dpm_m_prev"]))

    # distinct previous outputs: order 3 differs from order 2
    state["dpm_m_prev2"] = m0 + 0.3
    state["dpm_m_prev"] = m0 - 0.2
    out3b, _ = dpm_step(s, state, x, eps, t, prev_t, jnp.asarray(False),
                        jnp.asarray(False), solver_order=3)
    out2b, _ = dpm_step(s, state, x, eps, t, prev_t, jnp.asarray(False),
                        jnp.asarray(False), solver_order=2)
    assert not np.allclose(np.asarray(out3b), np.asarray(out2b))

    # warmup: with dpm_low=1 an order-3 request must take the order-2 branch
    state["dpm_low"] = jnp.asarray(1, jnp.int32)
    out_w, _ = dpm_step(s, state, x, eps, t, prev_t, jnp.asarray(False),
                        jnp.asarray(False), solver_order=3)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(out2b), rtol=1e-6)


def test_dpm_order3_end_to_end(tiny_model, test_image):
    from eta_inversion_tpu import load_inverter

    inv3 = load_inverter(tiny_model, "diffinv", scheduler="dpm",
                         num_inference_steps=5, solver_order=3)
    res3 = inv3.invert_sample(jnp.asarray(test_image), "a cat")
    m3 = float(np.asarray(res3["image"]).mean())
    assert np.isfinite(m3)
    inv2 = load_inverter(tiny_model, "diffinv", scheduler="dpm",
                         num_inference_steps=5, solver_order=2)
    res2 = inv2.invert_sample(jnp.asarray(test_image), "a cat")
    assert m3 != float(np.asarray(res2["image"]).mean())


def test_slerp():
    from eta_inversion_tpu.utils.math_utils import slerp, slerp_tensor

    key = jax.random.PRNGKey(0)
    low = jax.random.normal(key, (2, 16))
    high = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    np.testing.assert_allclose(np.asarray(slerp(0.0, low, high)),
                               np.asarray(low), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(slerp(1.0, low, high)),
                               np.asarray(high), rtol=1e-5, atol=1e-6)
    # unit vectors stay unit under slerp
    lu = low / np.linalg.norm(low, axis=1, keepdims=True)
    hu = high / np.linalg.norm(high, axis=1, keepdims=True)
    mid = np.asarray(slerp(0.5, jnp.asarray(lu), jnp.asarray(hu)))
    np.testing.assert_allclose(np.linalg.norm(mid, axis=1), 1.0, rtol=1e-5)
    out = slerp_tensor(0.3, low.reshape(2, 4, 4), high.reshape(2, 4, 4))
    assert out.shape == (2, 4, 4)


def test_ddpm_trajectory_and_step():
    s = make_schedule(10)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    xts = sample_trajectory(s, x0, jax.random.PRNGKey(1))
    assert xts.shape == (11, 1, 8, 8, 4)
    np.testing.assert_allclose(np.asarray(xts[-1]), np.asarray(x0))
    # markovian variant
    xts_m = sample_trajectory(s, x0, jax.random.PRNGKey(1), markovian=True)
    assert xts_m.shape == (11, 1, 8, 8, 4)

    # step: recorrected xtm1 must exactly reproduce the input xtm1
    t = jnp.asarray(int(s.timesteps_backward[3]))
    eps = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    xtm1_new, z = ddpm_inverse_step(s, eps, t, xts[3], xts[4])
    np.testing.assert_allclose(np.asarray(xtm1_new), np.asarray(xts[4]), rtol=1e-4, atol=1e-5)
