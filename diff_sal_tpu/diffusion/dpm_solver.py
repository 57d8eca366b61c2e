"""DPM-Solver / DPM-Solver++ (orders 1-3, singlestep & multistep) for TPU.

Covers the capability of the reference's vendored official implementation
(`models/dpm_solver/sampler.py:6-1247`): discrete-beta VP noise schedule with
logSNR clipping at -5.1, logSNR / time_uniform / time_quadratic step spacing,
noise- and data-prediction algorithms, lower_order_final warmup handling,
denoise_to_zero, and dynamic thresholding.

TPU-first formulation: every timestep, lambda, alpha and sigma is computed
host-side in float64 numpy at trace time (shapes and schedules are static),
so the sampler unrolls into a fixed chain of model calls + fused elementwise
updates — no host round-trips, no tensor bookkeeping of `t_prev_list` (the
reference threads model_prev_list/t_prev_list state through Python object
mutation; here they are just loop variables of the traced program).

Also fixes the reference's broken glue (SURVEY.md §8.1): `sample_image`
passes an undefined variable and asserts eps-parameterization against an
x0-trained model — here the parameterization follows `training_target`
consistently.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional

import jax.numpy as jnp
import numpy as np

from diff_sal_tpu.config import SamplingConfig
from diff_sal_tpu.diffusion.schedule import DiffusionSchedule

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


class DiscreteVPSchedule:
    """Continuous-time view of a discrete-beta VP diffusion
    (reference sampler.py:6-167, schedule='discrete').

    All methods take/return python floats or numpy arrays — used only at
    trace time.
    """

    def __init__(self, betas: np.ndarray, lambda_min_clip: float = -5.1):
        betas = np.asarray(betas, np.float64)
        log_alphas = 0.5 * np.cumsum(np.log(1.0 - betas))
        N = len(betas)
        t_array = np.linspace(0.0, 1.0, N + 1)[1:]
        # clip the tail where logSNR < lambda_min_clip (numerical stability,
        # matching the reference's numerical_clip_alpha)
        lambdas = log_alphas - 0.5 * np.log(1.0 - np.exp(2.0 * log_alphas))
        keep = int(np.sum(lambdas > lambda_min_clip))
        if keep < N:
            log_alphas = log_alphas[:keep]
            t_array = t_array[:keep]
        self.total_N = N
        self.t_array = t_array
        self.log_alpha_array = log_alphas
        self.T = float(t_array[-1])
        self.t_0 = 1.0 / N

    def marginal_log_mean_coeff(self, t):
        return np.interp(t, self.t_array, self.log_alpha_array)

    def marginal_alpha(self, t):
        return np.exp(self.marginal_log_mean_coeff(t))

    def marginal_std(self, t):
        return np.sqrt(1.0 - np.exp(2.0 * self.marginal_log_mean_coeff(t)))

    def marginal_lambda(self, t):
        log_a = self.marginal_log_mean_coeff(t)
        return log_a - 0.5 * np.log(1.0 - np.exp(2.0 * log_a))

    def inverse_lambda(self, lamb):
        lambdas = self.marginal_lambda(self.t_array)  # decreasing in t
        return np.interp(lamb, lambdas[::-1], self.t_array[::-1])

    def model_input_time(self, t):
        """Continuous t -> the discrete timestep index the network was
        trained on (reference sampler.py get_model_input_time)."""
        return (t - 1.0 / self.total_N) * 1000.0


def time_steps(
    ns: DiscreteVPSchedule, skip_type: str, t_T: float, t_0: float, N: int
) -> np.ndarray:
    """N+1 decreasing timesteps from t_T to t_0 (reference sampler.py
    get_time_steps)."""
    if skip_type == "logSNR":
        lT, l0 = ns.marginal_lambda(t_T), ns.marginal_lambda(t_0)
        return ns.inverse_lambda(np.linspace(lT, l0, N + 1))
    if skip_type == "time_uniform":
        return np.linspace(t_T, t_0, N + 1)
    if skip_type == "time_quadratic":
        return np.linspace(t_T ** (1 / 2), t_0 ** (1 / 2), N + 1) ** 2
    raise ValueError(f"unknown skip_type {skip_type}")


def singlestep_orders(steps: int, order: int) -> List[int]:
    """Split `steps` model evaluations into per-update orders
    (reference sampler.py get_orders_and_timesteps_for_singlestep)."""
    if order == 3:
        k = steps // 3 + 1
        if steps % 3 == 0:
            return [3] * (k - 2) + [2, 1]
        elif steps % 3 == 1:
            return [3] * (k - 1) + [1]
        return [3] * (k - 1) + [2]
    if order == 2:
        return [2] * (steps // 2) + ([1] if steps % 2 else [])
    return [1] * steps


def _dynamic_threshold(x0: jnp.ndarray, ratio: float = 0.995, max_val: float = 1.0):
    """Imagen-style dynamic thresholding (reference sampler.py:377-388)."""
    B = x0.shape[0]
    s = jnp.quantile(jnp.abs(x0).reshape(B, -1), ratio, axis=1)
    s = jnp.maximum(s, max_val).reshape((B,) + (1,) * (x0.ndim - 1))
    return jnp.clip(x0, -s, s) / s


def model_wrapper(
    model_fn: Callable,
    ns: DiscreteVPSchedule,
    *,
    model_type: str = "noise",  # noise | x_start | v | score
    guidance_type: str = "uncond",  # uncond | classifier | classifier-free
    condition=None,
    unconditional_condition=None,
    guidance_scale: float = 1.0,
    classifier_fn: Optional[Callable] = None,
) -> Callable[[jnp.ndarray, float], jnp.ndarray]:
    """Wrap a network into a continuous-time NOISE predictor with optional
    guidance (reference models/dpm_solver/sampler.py:170-334).

    `model_fn(x, t_input_vec, cond)` is the raw network; `cond` is passed
    through (None for unconditional calls). The returned `eps(x, t)` takes a
    trace-time float t in (0, 1] and converts whatever the network predicts
    (noise / x0 / v / score) to the noise parameterization, then applies:

      * 'uncond'          — plain call,
      * 'classifier'      — eps - s * guidance_scale * grad_x log p(c|x,t)
                            via `classifier_fn(x, t_input_vec, cond)` returning
                            per-example log-probabilities (jax.grad replaces
                            the reference's torch.autograd.grad, :205-216),
      * 'classifier-free' — e_uncond + s * (e_cond - e_uncond) (:300-327).

    Feed the result to `_Solver(..., training_target='noise',
    continuous_time=True)`, `dpm_solver_sample(..., wrapped_eps_fn=...)` or
    `adaptive_sample(..., wrapped_eps_fn=...)`.

    Times may be host floats (the static-step samplers, where the
    alpha/sigma conversions fold into trace-time constants) OR traced
    scalars (the adaptive solver's while_loop, where they become jnp.interp
    lookups over the discrete schedule grid).
    """
    import jax

    # jnp view of the schedule for traced times (same grid _TracedSchedule
    # interpolates over)
    _t_grid = jnp.asarray(ns.t_array, jnp.float32)
    _la_grid = jnp.asarray(ns.log_alpha_array, jnp.float32)

    def _alpha_sigma(t):
        if isinstance(t, (float, int)):
            return float(ns.marginal_alpha(t)), float(ns.marginal_std(t))
        la = jnp.interp(t, _t_grid, _la_grid)
        return jnp.exp(la), jnp.sqrt(1.0 - jnp.exp(2.0 * la))

    def _t_in(x, t):
        # jnp.full accepts traced fill values; model_input_time is plain
        # arithmetic so it works on host floats and tracers alike
        return jnp.full((x.shape[0],), ns.model_input_time(t), jnp.float32)

    def noise_pred(x, t, cond):
        out = model_fn(x, _t_in(x, t), cond)
        if model_type == "noise":
            return out
        a, s = _alpha_sigma(t)
        if model_type == "x_start":
            return (x - a * out) / s
        if model_type == "v":
            return a * out + s * x
        if model_type == "score":
            return -s * out
        raise ValueError(f"unknown model_type {model_type}")

    if guidance_type == "uncond":
        return lambda x, t: noise_pred(x, t, condition)

    if guidance_type == "classifier":
        assert classifier_fn is not None

        def eps(x, t):
            def log_prob(xi):
                return classifier_fn(xi, _t_in(xi, t), condition).sum()

            grad = jax.grad(log_prob)(x)
            _, s = _alpha_sigma(t)
            return noise_pred(x, t, None) - guidance_scale * s * grad

        return eps

    if guidance_type == "classifier-free":

        def eps(x, t: float):
            if guidance_scale == 1.0 or unconditional_condition is None:
                return noise_pred(x, t, condition)
            e_uncond = noise_pred(x, t, unconditional_condition)
            e_cond = noise_pred(x, t, condition)
            return e_uncond + guidance_scale * (e_cond - e_uncond)

        return eps

    raise ValueError(f"unknown guidance_type {guidance_type}")


class _Solver:
    """Static-shape DPM-Solver over a closed-form x0/eps predictor."""

    def __init__(
        self,
        ns: DiscreteVPSchedule,
        denoise_fn: DenoiseFn,
        *,
        algorithm: str = "dpmsolver",  # dpmsolver (eps) | dpmsolver++ (data)
        training_target: str = "x0",
        thresholding: bool = False,
        continuous_time: bool = False,
    ):
        self.ns = ns
        self.denoise_fn = denoise_fn
        self.algorithm = algorithm
        self.training_target = training_target
        self.thresholding = thresholding
        self.data_pred = algorithm == "dpmsolver++"
        # continuous_time: denoise_fn takes (x, t_continuous float) directly
        # (the model_wrapper contract) instead of (x, model-input time vec)
        self.continuous_time = continuous_time

    # ---- model parameterizations -------------------------------------
    def _raw(self, x, t: float):
        if self.continuous_time:
            return self.denoise_fn(x, t)
        B = x.shape[0]
        t_in = jnp.full((B,), self.ns.model_input_time(t), jnp.float32)
        return self.denoise_fn(x, t_in)

    def x0_pred(self, x, t: float):
        raw = self._raw(x, t)
        if self.training_target == "x0":
            x0 = raw
        else:  # model predicts noise
            a, s = self.ns.marginal_alpha(t), self.ns.marginal_std(t)
            x0 = (x - s * raw) / a
        if self.thresholding:
            x0 = _dynamic_threshold(x0)
        return x0

    def eps_pred(self, x, t: float):
        if self.training_target == "noise" and not self.thresholding:
            return self._raw(x, t)
        x0 = self.x0_pred(x, t)
        a, s = self.ns.marginal_alpha(t), self.ns.marginal_std(t)
        return (x - a * x0) / s

    def model(self, x, t: float):
        return self.x0_pred(x, t) if self.data_pred else self.eps_pred(x, t)

    # ---- update rules -------------------------------------------------
    def _coef(self, t: float):
        ns = self.ns
        return (
            ns.marginal_alpha(t),
            ns.marginal_std(t),
            ns.marginal_lambda(t),
        )

    def first_order_update(self, x, s: float, t: float, m_s):
        a_s, sig_s, l_s = self._coef(s)
        a_t, sig_t, l_t = self._coef(t)
        h = l_t - l_s
        if self.data_pred:
            return (sig_t / sig_s) * x - a_t * math.expm1(-h) * m_s
        return (a_t / a_s) * x - sig_t * math.expm1(h) * m_s

    def multistep_second_update(self, x, tl, ml, t: float):
        (t0, t1), (m0, m1) = tl, ml  # t0 more recent
        a_p, sig_p, l0 = self._coef(t0)
        a_t, sig_t, l_t = self._coef(t)
        l1 = self.ns.marginal_lambda(t1)
        h, h0 = l_t - l0, l0 - l1
        r0 = h0 / h
        D1 = (1.0 / r0) * (m0 - m1)
        if self.data_pred:
            phi = math.expm1(-h)
            return (sig_t / sig_p) * x - a_t * phi * m0 - 0.5 * a_t * phi * D1
        phi = math.expm1(h)
        return (a_t / a_p) * x - sig_t * phi * m0 - 0.5 * sig_t * phi * D1

    def multistep_third_update(self, x, tl, ml, t: float):
        (t0, t1, t2), (m0, m1, m2) = tl, ml
        a_p, sig_p, l0 = self._coef(t0)
        a_t, sig_t, l_t = self._coef(t)
        l1, l2 = self.ns.marginal_lambda(t1), self.ns.marginal_lambda(t2)
        h, h0, h1 = l_t - l0, l0 - l1, l1 - l2
        r0, r1 = h0 / h, h1 / h
        D1_0 = (1.0 / r0) * (m0 - m1)
        D1_1 = (1.0 / r1) * (m1 - m2)
        D1 = D1_0 + (r0 / (r0 + r1)) * (D1_0 - D1_1)
        D2 = (1.0 / (r0 + r1)) * (D1_0 - D1_1)
        if self.data_pred:
            phi_1 = math.expm1(-h)
            phi_2 = phi_1 / h + 1.0
            phi_3 = phi_2 / h - 0.5
            return (
                (sig_t / sig_p) * x
                - a_t * phi_1 * m0
                + a_t * phi_2 * D1
                - a_t * phi_3 * D2
            )
        phi_1 = math.expm1(h)
        phi_2 = phi_1 / h - 1.0
        phi_3 = phi_2 / h - 0.5
        return (
            (a_t / a_p) * x
            - sig_t * phi_1 * m0
            - sig_t * phi_2 * D1
            - sig_t * phi_3 * D2
        )

    def singlestep_second_update(self, x, s: float, t: float, r1: float = 0.5):
        ns = self.ns
        a_s, sig_s, l_s = self._coef(s)
        a_t, sig_t, l_t = self._coef(t)
        h = l_t - l_s
        s1 = float(ns.inverse_lambda(l_s + r1 * h))
        a_s1, sig_s1, _ = self._coef(s1)
        m_s = self.model(x, s)
        if self.data_pred:
            phi_11 = math.expm1(-r1 * h)
            phi_1 = math.expm1(-h)
            x_s1 = (sig_s1 / sig_s) * x - a_s1 * phi_11 * m_s
            m_s1 = self.model(x_s1, s1)
            return (
                (sig_t / sig_s) * x
                - a_t * phi_1 * m_s
                - (0.5 / r1) * a_t * phi_1 * (m_s1 - m_s)
            )
        phi_11 = math.expm1(r1 * h)
        phi_1 = math.expm1(h)
        x_s1 = (a_s1 / a_s) * x - sig_s1 * phi_11 * m_s
        m_s1 = self.model(x_s1, s1)
        return (
            (a_t / a_s) * x
            - sig_t * phi_1 * m_s
            - (0.5 / r1) * sig_t * phi_1 * (m_s1 - m_s)
        )

    def singlestep_third_update(
        self, x, s: float, t: float, r1: float = 1.0 / 3.0, r2: float = 2.0 / 3.0
    ):
        ns = self.ns
        a_s, sig_s, l_s = self._coef(s)
        a_t, sig_t, l_t = self._coef(t)
        h = l_t - l_s
        s1 = float(ns.inverse_lambda(l_s + r1 * h))
        s2 = float(ns.inverse_lambda(l_s + r2 * h))
        a_s1, sig_s1, _ = self._coef(s1)
        a_s2, sig_s2, _ = self._coef(s2)
        m_s = self.model(x, s)
        if self.data_pred:
            phi_11 = math.expm1(-r1 * h)
            phi_12 = math.expm1(-r2 * h)
            phi_1 = math.expm1(-h)
            phi_22 = math.expm1(-r2 * h) / (r2 * h) + 1.0
            phi_2 = phi_1 / h + 1.0
            x_s1 = (sig_s1 / sig_s) * x - a_s1 * phi_11 * m_s
            m_s1 = self.model(x_s1, s1)
            x_s2 = (
                (sig_s2 / sig_s) * x
                - a_s2 * phi_12 * m_s
                + (r2 / r1) * a_s2 * phi_22 * (m_s1 - m_s)
            )
            m_s2 = self.model(x_s2, s2)
            return (
                (sig_t / sig_s) * x
                - a_t * phi_1 * m_s
                + (1.0 / r2) * a_t * phi_2 * (m_s2 - m_s)
            )
        phi_11 = math.expm1(r1 * h)
        phi_12 = math.expm1(r2 * h)
        phi_1 = math.expm1(h)
        phi_22 = math.expm1(r2 * h) / (r2 * h) - 1.0
        phi_2 = phi_1 / h - 1.0
        x_s1 = (a_s1 / a_s) * x - sig_s1 * phi_11 * m_s
        m_s1 = self.model(x_s1, s1)
        x_s2 = (
            (a_s2 / a_s) * x
            - sig_s2 * phi_12 * m_s
            - (r2 / r1) * sig_s2 * phi_22 * (m_s1 - m_s)
        )
        m_s2 = self.model(x_s2, s2)
        return (
            (a_t / a_s) * x
            - sig_t * phi_1 * m_s
            - (1.0 / r2) * sig_t * phi_2 * (m_s2 - m_s)
        )

    # ---- drivers -------------------------------------------------------
    def sample_multistep(
        self,
        x,
        steps: int,
        skip_type: str = "logSNR",
        order: int = 2,
        lower_order_final: bool = False,
    ):
        ns = self.ns
        ts = time_steps(ns, skip_type, ns.T, ns.t_0, steps)
        model_list = [self.model(x, float(ts[0]))]
        t_list = [float(ts[0])]
        # warmup with increasing orders (reference sample(), method='multistep')
        for i in range(1, order):
            t = float(ts[i])
            x = self._multistep_update(x, t_list, model_list, t, order=i)
            t_list.append(t)
            model_list.append(self.model(x, t))
        for i in range(order, steps + 1):
            t = float(ts[i])
            step_order = (
                min(order, steps + 1 - i) if lower_order_final else order
            )
            x = self._multistep_update(x, t_list, model_list, t, order=step_order)
            t_list.append(t)
            model_list.append(self.model(x, t) if i < steps else None)
            t_list, model_list = t_list[-order:], model_list[-order:]
        return x

    def _multistep_update(self, x, t_list, model_list, t, order):
        if order == 1:
            return self.first_order_update(x, t_list[-1], t, model_list[-1])
        if order == 2:
            return self.multistep_second_update(
                x, (t_list[-1], t_list[-2]), (model_list[-1], model_list[-2]), t
            )
        if order == 3:
            return self.multistep_third_update(
                x,
                (t_list[-1], t_list[-2], t_list[-3]),
                (model_list[-1], model_list[-2], model_list[-3]),
                t,
            )
        raise ValueError(order)

    def sample_singlestep(self, x, steps: int, skip_type: str = "logSNR",
                          order: int = 2):
        ns = self.ns
        orders = singlestep_orders(steps, order)
        if skip_type == "logSNR":
            # one spacing per update, matching the reference's per-order split
            ts = time_steps(ns, skip_type, ns.T, ns.t_0, len(orders))
        else:
            full = time_steps(ns, skip_type, ns.T, ns.t_0, steps)
            idx = np.cumsum([0] + orders)
            ts = full[idx]
        for i, o in enumerate(orders):
            s, t = float(ts[i]), float(ts[i + 1])
            if o == 1:
                x = self.first_order_update(x, s, t, self.model(x, s))
            elif o == 2:
                x = self.singlestep_second_update(x, s, t)
            else:
                x = self.singlestep_third_update(x, s, t)
        return x

    def denoise_to_zero(self, x):
        return self.x0_pred(x, self.ns.t_0)


def dpm_solver_sample(
    schedule: DiffusionSchedule,
    denoise_fn: Optional[DenoiseFn],
    x: jnp.ndarray,
    *,
    sampling: SamplingConfig,
    training_target: str = "x0",
    wrapped_eps_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """Run DPM-Solver per the sampling config (reference sample_image's
    dpmsolver branch, diffusion_trainer.py:582-636, with working glue).

    Pass `wrapped_eps_fn` (a `model_wrapper` result — continuous-time noise
    predictor, possibly guided) INSTEAD of `denoise_fn` to sample with
    guidance."""
    ns = DiscreteVPSchedule(np.asarray(schedule.betas))
    if wrapped_eps_fn is not None:
        solver = _Solver(
            ns,
            wrapped_eps_fn,
            algorithm=sampling.sample_type,
            training_target="noise",
            thresholding=sampling.thresholding,
            continuous_time=True,
        )
    else:
        solver = _Solver(
            ns,
            denoise_fn,
            algorithm=sampling.sample_type,
            training_target=training_target,
            thresholding=sampling.thresholding,
        )
    steps = sampling.timesteps - 1 if sampling.denoise else sampling.timesteps
    steps = max(steps, 1)
    if sampling.dpm_solver_method == "multistep":
        x = solver.sample_multistep(
            x,
            steps,
            skip_type=sampling.skip_type,
            order=min(sampling.dpm_solver_order, steps),
            lower_order_final=sampling.lower_order_final,
        )
    elif sampling.dpm_solver_method in ("singlestep", "singlestep_fixed"):
        x = solver.sample_singlestep(
            x, steps, skip_type=sampling.skip_type,
            order=min(sampling.dpm_solver_order, steps),
        )
    else:
        raise NotImplementedError(sampling.dpm_solver_method)
    if sampling.denoise:
        x = solver.denoise_to_zero(x)
    return x


# ---------------------------------------------------------------------------
# Adaptive step-size solver (DPM-Solver-12) — data-dependent control flow via
# lax.while_loop; schedule lookups become jnp.interp over the discrete grid
# (reference sampler.py:973-1032).
# ---------------------------------------------------------------------------


class _TracedSchedule:
    """jnp view of DiscreteVPSchedule for use inside traced loop bodies."""

    def __init__(self, ns: DiscreteVPSchedule):
        self.t_array = jnp.asarray(ns.t_array, jnp.float32)
        self.log_alpha_array = jnp.asarray(ns.log_alpha_array, jnp.float32)
        lambdas = np.asarray(ns.marginal_lambda(ns.t_array), np.float64)
        self._lam_rev = jnp.asarray(lambdas[::-1].copy(), jnp.float32)
        self._t_rev = jnp.asarray(ns.t_array[::-1].copy(), jnp.float32)
        self.total_N = ns.total_N

    def log_alpha(self, t):
        return jnp.interp(t, self.t_array, self.log_alpha_array)

    def alpha(self, t):
        return jnp.exp(self.log_alpha(t))

    def sigma(self, t):
        return jnp.sqrt(1.0 - jnp.exp(2.0 * self.log_alpha(t)))

    def lam(self, t):
        la = self.log_alpha(t)
        return la - 0.5 * jnp.log(1.0 - jnp.exp(2.0 * la))

    def inverse_lambda(self, lamb):
        return jnp.interp(lamb, self._lam_rev, self._t_rev)

    def model_input_time(self, t):
        return (t - 1.0 / self.total_N) * 1000.0


def adaptive_sample(
    schedule: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    x: jnp.ndarray,
    *,
    training_target: str = "x0",
    algorithm: str = "dpmsolver++",
    order: int = 2,
    atol: float = 0.0078,
    rtol: float = 0.05,
    theta: float = 0.9,
    h_init: float = 0.05,
    max_steps: int = 200,
    wrapped_eps_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """Adaptive DPM-Solver-12 (order=2) / DPM-Solver-23 (order=3): low- vs
    high-order singlestep error control with step acceptance, as a jittable
    while_loop (reference sampler.py:973-1032). Order 2 compares first-order
    vs singlestep-2 (r1=0.5); order 3 compares singlestep-2 (r1=1/3, reusing
    its intermediate model call) vs singlestep-3 (r1=1/3, r2=2/3).

    `wrapped_eps_fn` (from `model_wrapper`, which the reference pairs with
    the adaptive solver for guided sampling, sampler.py:1091-1099) overrides
    `denoise_fn`/`training_target`: a continuous-time noise predictor
    `eps(x, t)` called with the loop's traced times."""
    import jax

    assert order in (2, 3), order

    ns_host = DiscreteVPSchedule(np.asarray(schedule.betas))
    ns = _TracedSchedule(ns_host)
    t_0, t_T = ns_host.t_0, ns_host.T
    lambda_0 = float(ns_host.marginal_lambda(t_0))
    data_pred = algorithm == "dpmsolver++"

    def model(x, t):
        if wrapped_eps_fn is not None:
            eps = wrapped_eps_fn(x, t)
            if data_pred:
                return (x - ns.sigma(t) * eps) / ns.alpha(t)
            return eps
        t_in = jnp.full((x.shape[0],), ns.model_input_time(t), jnp.float32)
        raw = denoise_fn(x, t_in)
        if training_target == "x0":
            x0 = raw
        else:
            x0 = (x - ns.sigma(t) * raw) / ns.alpha(t)
        if data_pred:
            return x0
        return (x - ns.alpha(t) * x0) / ns.sigma(t)

    def first_order(x, s, t, m_s):
        h = ns.lam(t) - ns.lam(s)
        if data_pred:
            return (ns.sigma(t) / ns.sigma(s)) * x - ns.alpha(t) * jnp.expm1(-h) * m_s
        return (ns.alpha(t) / ns.alpha(s)) * x - ns.sigma(t) * jnp.expm1(h) * m_s

    def second_order(x, s, t, m_s, r1=0.5):
        """Singlestep-2 update; also returns its intermediate model call
        (reference return_intermediate=True) for reuse by third_order."""
        h = ns.lam(t) - ns.lam(s)
        s1 = ns.inverse_lambda(ns.lam(s) + r1 * h)
        if data_pred:
            x_s1 = (ns.sigma(s1) / ns.sigma(s)) * x - ns.alpha(s1) * jnp.expm1(
                -r1 * h
            ) * m_s
            m_s1 = model(x_s1, s1)
            x_t = (
                (ns.sigma(t) / ns.sigma(s)) * x
                - ns.alpha(t) * jnp.expm1(-h) * m_s
                - (0.5 / r1) * ns.alpha(t) * jnp.expm1(-h) * (m_s1 - m_s)
            )
            return x_t, m_s1
        x_s1 = (ns.alpha(s1) / ns.alpha(s)) * x - ns.sigma(s1) * jnp.expm1(
            r1 * h
        ) * m_s
        m_s1 = model(x_s1, s1)
        x_t = (
            (ns.alpha(t) / ns.alpha(s)) * x
            - ns.sigma(t) * jnp.expm1(h) * m_s
            - (0.5 / r1) * ns.sigma(t) * jnp.expm1(h) * (m_s1 - m_s)
        )
        return x_t, m_s1

    def third_order(x, s, t, m_s, m_s1, r1=1.0 / 3.0, r2=2.0 / 3.0):
        """Singlestep-3 update reusing m_s and m_s1 from the order-2 lower
        update (reference dpm_solver_third_update with model_s/model_s1)."""
        h = ns.lam(t) - ns.lam(s)
        s2 = ns.inverse_lambda(ns.lam(s) + r2 * h)
        if data_pred:
            phi_12 = jnp.expm1(-r2 * h)
            phi_1 = jnp.expm1(-h)
            phi_22 = jnp.expm1(-r2 * h) / (r2 * h) + 1.0
            phi_2 = phi_1 / h + 1.0
            x_s2 = (
                (ns.sigma(s2) / ns.sigma(s)) * x
                - ns.alpha(s2) * phi_12 * m_s
                + (r2 / r1) * ns.alpha(s2) * phi_22 * (m_s1 - m_s)
            )
            m_s2 = model(x_s2, s2)
            return (
                (ns.sigma(t) / ns.sigma(s)) * x
                - ns.alpha(t) * phi_1 * m_s
                + (1.0 / r2) * ns.alpha(t) * phi_2 * (m_s2 - m_s)
            )
        phi_12 = jnp.expm1(r2 * h)
        phi_1 = jnp.expm1(h)
        phi_22 = jnp.expm1(r2 * h) / (r2 * h) - 1.0
        phi_2 = phi_1 / h - 1.0
        x_s2 = (
            (ns.alpha(s2) / ns.alpha(s)) * x
            - ns.sigma(s2) * phi_12 * m_s
            - (r2 / r1) * ns.sigma(s2) * phi_22 * (m_s1 - m_s)
        )
        m_s2 = model(x_s2, s2)
        return (
            (ns.alpha(t) / ns.alpha(s)) * x
            - ns.sigma(t) * phi_1 * m_s
            - (1.0 / r2) * ns.sigma(t) * phi_2 * (m_s2 - m_s)
        )

    def cond(carry):
        s, h, x, x_prev, nfe = carry
        return jnp.logical_and(ns.lam(s) < lambda_0 - 1e-5, nfe < max_steps)

    def body(carry):
        s, h, x, x_prev, nfe = carry
        t = ns.inverse_lambda(jnp.minimum(ns.lam(s) + h, lambda_0))
        m_s = model(x, s)
        if order == 2:
            x_lower = first_order(x, s, t, m_s)
            x_higher, _ = second_order(x, s, t, m_s)
        else:  # adaptive-23 (reference sampler.py:1006-1015)
            x_lower, m_s1 = second_order(x, s, t, m_s, r1=1.0 / 3.0)
            x_higher = third_order(x, s, t, m_s, m_s1)
        # elementwise tolerance like the reference (sampler.py:994-1002):
        # delta = max(atol, rtol * max(|x_lower|, |x_prev|)) per element,
        # error = per-sample RMS of the scaled difference, reduced with MAX
        # over the batch (the reference's `norm_fn` is an L2 over each
        # sample's flattened tail dims followed by .max())
        delta = jnp.maximum(
            atol, rtol * jnp.maximum(jnp.abs(x_lower), jnp.abs(x_prev))
        )
        v = ((x_higher - x_lower) / delta).reshape(x.shape[0], -1)
        err = jnp.max(jnp.sqrt(jnp.mean(v**2, axis=-1)))
        accept = err <= 1.0
        s_new = jnp.where(accept, t, s)
        x_new = jnp.where(accept, x_higher, x)
        x_prev_new = jnp.where(accept, x_lower, x_prev)
        h_new = jnp.minimum(
            theta * h * jnp.maximum(err, 1e-10) ** (-1.0 / order),
            lambda_0 - ns.lam(s_new),
        )
        return (s_new, h_new, x_new, x_prev_new, nfe + order)

    s0 = jnp.asarray(t_T, jnp.float32)
    carry = (s0, jnp.asarray(h_init, jnp.float32), x, x, jnp.asarray(0))
    s, h, x, _, nfe = jax.lax.while_loop(cond, body, carry)
    # final denoise to x0 (t_0 is a host float -> constant coefficients)
    if wrapped_eps_fn is not None:
        eps = wrapped_eps_fn(x, t_0)
        a0 = float(ns_host.marginal_alpha(t_0))
        s0_ = float(ns_host.marginal_std(t_0))
        return (x - s0_ * eps) / a0
    raw = denoise_fn(
        x, jnp.full((x.shape[0],), ns.model_input_time(t_0), jnp.float32)
    )
    if training_target == "x0":
        return raw
    return (x - ns.sigma(t_0) * raw) / ns.alpha(t_0)
