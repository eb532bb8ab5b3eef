"""Cross-framework numerical checks: torch-fp64 replicas of the reference's
scheduler math vs the JAX pure functions.

The replicas below are independent fp64 ports of the update rules the
reference relies on:
  * DDIM inverse, 3 timestep-indexing modes + backward eta step
    (/root/reference/modules/inverse_schedulers/scheduling_ddim_inverse.py:71-143)
  * DDPM-inverse noisemap extraction
    (/root/reference/modules/inverse_schedulers/ddpm_inverse_scheduler.py:65-199)
  * DPM-Solver++ multistep orders 1/2/3 with the lower-order ramp
    (/root/reference/modules/inverse_schedulers/scheduling_dpmsolver_multistep_inverse.py:83-159,
     delegating to diffusers DPMSolverMultistepScheduler update rules)

Pixel-level parity with the reference is impossible offline (no SD weights);
these tests pin the scheduler layer to the reference bit-for-bit up to fp32
rounding, over randomized (latent, eps, t) sweeps.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from eta_inversion_tpu.schedulers import (  # noqa: E402
    DiffusionSchedule,
    ddim_backward_step,
    ddim_inverse_step,
)
from eta_inversion_tpu.schedulers.ddpm_inverse import ddpm_inverse_step  # noqa: E402
from eta_inversion_tpu.schedulers.dpm import (  # noqa: E402
    dpm_init_state,
    dpm_step,
    dpm_timesteps_backward,
    dpm_timesteps_forward,
)
from eta_inversion_tpu.schedulers.tables import ScheduleConfig  # noqa: E402

S = 10  # inference steps -> step ratio 100
SCHED = DiffusionSchedule(ScheduleConfig(), num_inference_steps=S)
RATIO = 1000 // S

TOL = dict(rtol=2e-5, atol=2e-5)  # fp32 pipeline vs fp64 replica


# ---------------------------------------------------------------------------
# torch fp64 replica of the reference schedule tables
# ---------------------------------------------------------------------------

class TorchSchedule:
    def __init__(self):
        betas = torch.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000,
                               dtype=torch.float64) ** 2
        self.alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
        self.final_alpha_cumprod = self.alphas_cumprod[0]  # set_alpha_to_one=False

    def abar(self, t: int):
        t = min(int(t), 999)
        return self.alphas_cumprod[t] if t >= 0 else self.final_alpha_cumprod

    # reference ddim_step (scheduling_ddim_inverse.py:71-100)
    def ddim_step(self, sample, eps, t_from: int, t_to: int):
        a_t = self.abar(t_from)
        a_to = self.abar(t_to)
        beta_t = 1.0 - a_t
        x0 = (sample - beta_t ** 0.5 * eps) / a_t ** 0.5
        return a_to ** 0.5 * x0 + (1.0 - a_to) ** 0.5 * eps

    # diffusers DDIMScheduler._get_variance (= reference get_variance,
    # ddpm_inverse_scheduler.py:65-84)
    def variance(self, t: int):
        a_t, a_prev = self.abar(t), self.abar(t - RATIO)
        return ((1.0 - a_prev) / (1.0 - a_t)) * (1.0 - a_t / a_prev)

    # diffusers DDIMScheduler.step with eta (the reference backward process)
    def ddim_backward(self, sample, eps, t: int, eta=0.0, noise=None):
        a_t, a_prev = self.abar(t), self.abar(t - RATIO)
        x0 = (sample - (1.0 - a_t) ** 0.5 * eps) / a_t ** 0.5
        std = eta * self.variance(t) ** 0.5
        prev = a_prev ** 0.5 * x0 + (1.0 - a_prev - std ** 2) ** 0.5 * eps
        if noise is not None:
            prev = prev + std * noise
        return prev

    # reference DDPMInverseScheduler.step (ddpm_inverse_scheduler.py:156-199)
    def ddpm_inverse(self, eps, t: int, xt, xtm1, eta=1.0):
        a_t, a_prev = self.abar(t), self.abar(t - RATIO)
        x0 = (xt - (1.0 - a_t) ** 0.5 * eps) / a_t ** 0.5
        variance = self.variance(t)
        mu = a_prev ** 0.5 * x0 + (1.0 - a_prev - eta * variance) ** 0.5 * eps
        z = (xtm1 - mu) / (eta * variance ** 0.5)
        return mu + (eta * variance ** 0.5) * z, z


def _rand(shape=(2, 4, 4, 2), seed=0, n=2):
    rs = np.random.RandomState(seed)
    return [rs.randn(*shape).astype(np.float64) for _ in range(n)]


def _sweep_ts():
    return [0, 100, 300, 500, 900, 980, 999]


# ---------------------------------------------------------------------------
# DDIM
# ---------------------------------------------------------------------------

def test_ddim_inverse_step_three_modes_match_torch():
    ts = TorchSchedule()
    lat, eps = _rand(seed=1)
    for t in _sweep_ts():
        for mode, (t_from, t_to) in {
            "sameshift": (t - RATIO, t),
            "samesame": (t, t + RATIO),
            "shiftshift": (t, t + RATIO),
        }.items():
            ours = np.asarray(ddim_inverse_step(
                SCHED, jnp.asarray(lat, jnp.float32), jnp.asarray(eps, jnp.float32),
                t, mode))
            ref = ts.ddim_step(torch.tensor(lat), torch.tensor(eps), t_from, t_to)
            np.testing.assert_allclose(ours, ref.numpy(), **TOL,
                                       err_msg=f"{mode}@t={t}")


def test_ddim_backward_step_deterministic_matches_torch():
    ts = TorchSchedule()
    lat, eps = _rand(seed=2)
    for t in _sweep_ts():
        ours = np.asarray(ddim_backward_step(
            SCHED, jnp.asarray(lat, jnp.float32), jnp.asarray(eps, jnp.float32), t))
        ref = ts.ddim_backward(torch.tensor(lat), torch.tensor(eps), t)
        np.testing.assert_allclose(ours, ref.numpy(), **TOL, err_msg=f"t={t}")


def test_ddim_backward_step_eta_noise_matches_torch():
    ts = TorchSchedule()
    lat, eps, noise = _rand(seed=3, n=3)
    for t in [100, 500, 900]:
        for eta in (0.25, 1.0):
            ours = np.asarray(ddim_backward_step(
                SCHED, jnp.asarray(lat, jnp.float32), jnp.asarray(eps, jnp.float32),
                t, eta=eta, noise=jnp.asarray(noise, jnp.float32)))
            ref = ts.ddim_backward(torch.tensor(lat), torch.tensor(eps), t,
                                   eta=eta, noise=torch.tensor(noise))
            np.testing.assert_allclose(ours, ref.numpy(), **TOL,
                                       err_msg=f"eta={eta}@t={t}")


def test_ddim_backward_step_elementwise_eta_matches_torch():
    """Per-pixel eta (the EtaTensor replacement) must agree with running the
    torch replica pixelwise."""
    ts = TorchSchedule()
    lat, eps, noise = _rand(seed=4, n=3)
    eta_map = np.linspace(0, 1, lat.size).reshape(lat.shape)
    t = 500
    ours = np.asarray(ddim_backward_step(
        SCHED, jnp.asarray(lat, jnp.float32), jnp.asarray(eps, jnp.float32), t,
        eta=jnp.asarray(eta_map, jnp.float32), noise=jnp.asarray(noise, jnp.float32)))
    ref = ts.ddim_backward(torch.tensor(lat), torch.tensor(eps), t,
                           eta=torch.tensor(eta_map), noise=torch.tensor(noise))
    np.testing.assert_allclose(ours, ref.numpy(), **TOL)


# ---------------------------------------------------------------------------
# DDPM inverse (noisemap extraction)
# ---------------------------------------------------------------------------

def test_ddpm_inverse_step_matches_torch():
    ts = TorchSchedule()
    eps, xt, xtm1 = _rand(seed=5, n=3)
    for t in [100, 300, 500, 900, 980]:
        ours_x, ours_z = ddpm_inverse_step(
            SCHED, jnp.asarray(eps, jnp.float32), t,
            jnp.asarray(xt, jnp.float32), jnp.asarray(xtm1, jnp.float32))
        ref_x, ref_z = ts.ddpm_inverse(torch.tensor(eps), t, torch.tensor(xt),
                                       torch.tensor(xtm1))
        np.testing.assert_allclose(np.asarray(ours_z), ref_z.numpy(), **TOL,
                                   err_msg=f"z@t={t}")
        np.testing.assert_allclose(np.asarray(ours_x), ref_x.numpy(), **TOL,
                                   err_msg=f"x@t={t}")


# ---------------------------------------------------------------------------
# DPM-Solver++ multistep (orders 1/2/3, lower-order ramp, both directions)
# ---------------------------------------------------------------------------

class TorchDpm:
    """fp64 replica of the diffusers DPMSolverMultistepScheduler updates the
    reference inverse scheduler dispatches to (dpmsolver++, epsilon)."""

    def __init__(self, order):
        self.ts = TorchSchedule()
        self.order = order
        self.outputs = []   # converted x0 predictions, most recent last
        self.tlist = []     # their timesteps
        self.low = 0

    def lam(self, t):
        a = self.ts.abar(t).clamp_min(1e-20) ** 0.5
        s = (1.0 - self.ts.abar(t)).clamp_min(1e-40) ** 0.5
        return torch.log(a) - torch.log(s)

    def a_s(self, t):
        ab = self.ts.abar(t)
        return ab ** 0.5, (1.0 - ab) ** 0.5

    def step(self, x, eps, t, prev_t, is_last, is_second_last):
        m0 = (x - self.a_s(t)[1] * eps) / self.a_s(t)[0]
        self.outputs.append(m0)
        self.tlist.append(t)
        self.outputs = self.outputs[-3:]
        self.tlist = self.tlist[-3:]

        a_p, s_p = self.a_s(prev_t)
        _, s_t = self.a_s(t)
        h = self.lam(prev_t) - self.lam(t)

        lower_final = is_last  # lower_order_final and S < 15 in both frameworks
        use_first = self.order == 1 or self.low < 1 or lower_final
        use_second = self.order == 2 or self.low < 2 or is_second_last

        if use_first:
            out = (s_p / s_t) * x - a_p * (torch.exp(-h) - 1.0) * m0
        else:
            m1 = self.outputs[-2]
            h0 = self.lam(t) - self.lam(self.tlist[-2])
            r0 = h0 / h
            d1 = (m0 - m1) / r0
            if use_second:
                out = (s_p / s_t) * x - a_p * (torch.exp(-h) - 1.0) * m0 \
                    - 0.5 * a_p * (torch.exp(-h) - 1.0) * d1
            else:
                m2 = self.outputs[-3]
                h1 = self.lam(self.tlist[-2]) - self.lam(self.tlist[-3])
                r1 = h1 / h
                d1_1 = (m1 - m2) / r1
                d1t = d1 + (r0 / (r0 + r1)) * (d1 - d1_1)
                d2 = (d1 - d1_1) / (r0 + r1)
                out = (s_p / s_t) * x \
                    - a_p * (torch.exp(-h) - 1.0) * m0 \
                    + a_p * ((torch.exp(-h) - 1.0) / h + 1.0) * d1t \
                    - a_p * ((torch.exp(-h) - 1.0 + h) / (h * h) - 0.5) * d2
        self.low = min(self.low + 1, self.order)
        return out


def _run_dpm_pair(order, ts_grid, prev_grid, seed):
    """Drive both implementations over a grid with fresh random eps each step."""
    rs = np.random.RandomState(seed)
    lat = rs.randn(2, 4, 4, 2).astype(np.float64)
    ours = jnp.asarray(lat, jnp.float32)
    ref = torch.tensor(lat)
    replica = TorchDpm(order)
    state = dpm_init_state(ours.shape)
    n = len(ts_grid)
    for i, (t, pt) in enumerate(zip(ts_grid, prev_grid)):
        eps = rs.randn(*lat.shape).astype(np.float64)
        ours, state = dpm_step(SCHED, state, ours, jnp.asarray(eps, jnp.float32),
                               int(t), int(pt), jnp.asarray(i == n - 1),
                               jnp.asarray(i == n - 2), solver_order=order)
        ref = replica.step(ref, torch.tensor(eps), int(t), int(pt),
                           i == n - 1, i == n - 2)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), **TOL,
                                   err_msg=f"order={order} step {i} (t={t})")


@pytest.mark.parametrize("order", [1, 2, 3])
def test_dpm_multistep_backward_matches_torch(order):
    ts_grid = dpm_timesteps_backward(SCHED)
    prev = np.concatenate([ts_grid[1:], [0]])
    _run_dpm_pair(order, ts_grid, prev, seed=6 + order)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_dpm_multistep_forward_matches_torch(order):
    ts_grid = dpm_timesteps_forward(SCHED, "samesame")
    prev = np.concatenate([ts_grid[1:], [999]])
    _run_dpm_pair(order, ts_grid, prev, seed=16 + order)


# ---------------------------------------------------------------------------
# SSIM / MS-SSIM vs the LITERAL pytorch-msssim oracle (tests/oracle_msssim.py,
# a faithful port of the implementation the reference bundles at
# /root/reference/metrics/msssim.py) — an independent replica could share a
# misreading (it did, round 2: right-side-only pool padding); the oracle can't.
# ---------------------------------------------------------------------------

def _rand_pair(shape, seed=0):
    rs = np.random.RandomState(seed)
    a = rs.rand(*shape).astype(np.float32)
    b = np.clip(a + rs.randn(*shape).astype(np.float32) * 0.1, 0, 1)
    return a, b


@pytest.mark.parametrize("shape", [(2, 64, 64, 3), (1, 97, 83, 3)])
def test_ssim_matches_torch_oracle(shape):
    import torch

    from tests import oracle_msssim
    from eta_inversion_tpu.metrics.ssim import ssim

    a, b = _rand_pair(shape, seed=1)
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ta = torch.from_numpy(a).double().permute(0, 3, 1, 2)
    tb = torch.from_numpy(b).double().permute(0, 3, 1, 2)
    want = float(oracle_msssim.ssim(ta, tb, data_range=1.0))
    assert got == pytest.approx(want, abs=2e-5)


@pytest.mark.parametrize("shape", [(1, 180, 180, 3), (2, 181, 163, 3)])
def test_msssim_matches_torch_oracle(shape):
    import torch

    from tests import oracle_msssim
    from eta_inversion_tpu.metrics.ssim import ms_ssim

    a, b = _rand_pair(shape, seed=2)
    got = float(ms_ssim(jnp.asarray(a), jnp.asarray(b)))
    x = torch.from_numpy(a).double().permute(0, 3, 1, 2)
    y = torch.from_numpy(b).double().permute(0, 3, 1, 2)
    want = float(oracle_msssim.ms_ssim(x, y, data_range=1.0))
    assert got == pytest.approx(want, abs=5e-5)


def test_psnr_mse_match_torch():
    import torch

    from eta_inversion_tpu.metrics.simple import MSEMetric, PSNRMetric

    a, b = _rand_pair((1, 64, 64, 3), seed=3)
    mse = MSEMetric(input_range=(0, 1))
    psnr = PSNRMetric(input_range=(0, 1))
    got_mse = float(mse.forward(a, b))
    got_psnr = float(psnr.forward(a, b))
    ta, tb = torch.from_numpy(a).double(), torch.from_numpy(b).double()
    want_mse = float(((ta - tb) ** 2).mean())
    want_psnr = float(10 * torch.log10(1.0 / ((ta - tb) ** 2).mean()))
    assert got_mse == pytest.approx(want_mse, rel=1e-5)
    assert got_psnr == pytest.approx(want_psnr, rel=1e-5)
