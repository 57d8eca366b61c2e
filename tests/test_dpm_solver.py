"""DPM-Solver correctness: schedule invariants, exactness for constant-x0
models, and convergence-order behavior on a linear model."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from diff_sal_tpu.config import SamplingConfig
from diff_sal_tpu.diffusion.dpm_solver import (
    DiscreteVPSchedule,
    _Solver,
    dpm_solver_sample,
    singlestep_orders,
    time_steps,
)
from diff_sal_tpu.diffusion.schedule import get_beta_schedule, make_schedule


def _ns():
    betas = get_beta_schedule(
        "cosine", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=1000
    )
    return DiscreteVPSchedule(betas)


def test_schedule_lambda_monotone_and_clipped():
    ns = _ns()
    lam = ns.marginal_lambda(ns.t_array)
    assert np.all(np.diff(lam) < 0)  # decreasing in t
    assert lam.min() > -5.1 - 1e-6  # logSNR clip
    assert ns.T <= 1.0 and ns.t_0 == 1e-3
    # alpha^2 + sigma^2 == 1
    t = np.linspace(ns.t_0, ns.T, 50)
    np.testing.assert_allclose(
        ns.marginal_alpha(t) ** 2 + ns.marginal_std(t) ** 2, 1.0, rtol=1e-10
    )


def test_inverse_lambda_roundtrip():
    ns = _ns()
    t = np.linspace(ns.t_0, ns.T, 17)
    np.testing.assert_allclose(
        ns.inverse_lambda(ns.marginal_lambda(t)), t, atol=1e-5
    )


def test_model_input_time_contract():
    ns = _ns()
    np.testing.assert_allclose(ns.model_input_time(1.0), 999.0)
    np.testing.assert_allclose(ns.model_input_time(1e-3), 0.0)


def test_time_steps_endpoints():
    ns = _ns()
    for skip in ("logSNR", "time_uniform", "time_quadratic"):
        ts = time_steps(ns, skip, ns.T, ns.t_0, 10)
        assert len(ts) == 11
        np.testing.assert_allclose(ts[0], ns.T, rtol=1e-6)
        np.testing.assert_allclose(ts[-1], ns.t_0, rtol=1e-6)
        assert np.all(np.diff(ts) < 0)


def test_singlestep_orders_split():
    # official split: trailing lower orders close out the remainder
    assert singlestep_orders(6, 3) == [3, 2, 1]
    assert singlestep_orders(7, 3) == [3, 3, 1]
    assert singlestep_orders(8, 3) == [3, 3, 2]
    assert singlestep_orders(5, 2) == [2, 2, 1]
    assert singlestep_orders(3, 1) == [1, 1, 1]


def _const_model(c):
    def fn(x, t_vec):
        return jnp.full_like(x, c)

    return fn


def test_constant_model_exact_all_methods():
    """For a constant x0-predictor the solver updates are exact: the final
    denoised output equals the constant for every order/method/algorithm."""
    ns = _ns()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 1).astype(np.float32))
    for algo in ("dpmsolver", "dpmsolver++"):
        for order in (1, 2, 3):
            sol = _Solver(ns, _const_model(0.37), algorithm=algo)
            y = sol.sample_multistep(x, steps=6, order=order)
            y = sol.denoise_to_zero(y)
            np.testing.assert_allclose(np.asarray(y), 0.37, atol=1e-4,
                                       err_msg=f"{algo} multistep o{order}")
            y2 = sol.sample_singlestep(x, steps=6, order=order)
            y2 = sol.denoise_to_zero(y2)
            np.testing.assert_allclose(np.asarray(y2), 0.37, atol=1e-4,
                                       err_msg=f"{algo} singlestep o{order}")


def test_convergence_order_on_linear_model():
    """x0(x) = 0.9x gives a linear probability-flow ODE; higher orders must
    track the fine-grained solution better at equal NFE."""
    ns = _ns()

    def model(x, t_vec):
        return 0.9 * x

    x = jnp.asarray(np.random.RandomState(1).randn(1, 6, 6, 1).astype(np.float32))
    ref_sol = _Solver(ns, model, algorithm="dpmsolver++")
    x_ref = np.asarray(ref_sol.sample_multistep(x, steps=256, order=3))

    errs = {}
    for order in (1, 2, 3):
        sol = _Solver(ns, model, algorithm="dpmsolver++")
        y = np.asarray(sol.sample_multistep(x, steps=32, order=order))
        errs[order] = np.abs(y - x_ref).max()
    # monotone improvement with order at fixed NFE
    assert errs[2] < errs[1] * 0.5, errs
    assert errs[3] < errs[2], errs
    # and each order converges with more steps
    y16 = np.asarray(
        _Solver(ns, model, algorithm="dpmsolver++").sample_multistep(
            x, steps=16, order=2
        )
    )
    assert errs[2] < np.abs(y16 - x_ref).max(), "order-2 must improve with steps"


def test_dpm_solver_sample_wiring():
    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)
    x = jnp.ones((1, 4, 4, 1))
    cfg = SamplingConfig(
        sample_type="dpmsolver", timesteps=5, dpm_solver_order=2,
        dpm_solver_method="multistep", skip_type="logSNR", denoise=True,
    )
    out = dpm_solver_sample(
        schedule, _const_model(0.5), x, sampling=cfg, training_target="x0"
    )
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-4)
    cfg_pp = dataclasses.replace(cfg, sample_type="dpmsolver++",
                                 thresholding=True)
    out2 = dpm_solver_sample(
        schedule, _const_model(0.5), x, sampling=cfg_pp, training_target="x0"
    )
    np.testing.assert_allclose(np.asarray(out2), 0.5, atol=1e-4)


def test_noise_parameterized_model():
    """training_target='noise': model returns eps; constant-data check via
    eps(x,t) = (x - a c)/s for data point-mass at c."""
    ns = _ns()
    c = 0.25

    class EpsModel:
        def __init__(self, ns):
            self.ns = ns
            self.t = None

        def __call__(self, x, t_vec):
            # invert model_input_time: t_cont = t_in/1000 + 1/N
            t_cont = float(t_vec[0]) / 1000.0 + 1.0 / self.ns.total_N
            a = self.ns.marginal_alpha(t_cont)
            s = self.ns.marginal_std(t_cont)
            return (x - a * c) / s

    sol = _Solver(ns, EpsModel(ns), algorithm="dpmsolver",
                  training_target="noise")
    x = jnp.asarray(np.random.RandomState(2).randn(1, 4, 4, 1).astype(np.float32))
    y = sol.sample_multistep(x, steps=10, order=2)
    y = sol.denoise_to_zero(y)
    np.testing.assert_allclose(np.asarray(y), c, atol=1e-3)


def test_adaptive_sampler_constant_model():
    from diff_sal_tpu.diffusion.dpm_solver import adaptive_sample

    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 6, 6, 1).astype(np.float32))
    out = adaptive_sample(
        schedule, _const_model(0.4), x, training_target="x0",
        algorithm="dpmsolver++",
    )
    np.testing.assert_allclose(np.asarray(out), 0.4, atol=2e-3)


def test_adaptive_sampler_jits():
    import jax

    from diff_sal_tpu.diffusion.dpm_solver import adaptive_sample

    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)

    def model(x, t):
        return 0.8 * x

    f = jax.jit(
        lambda x: adaptive_sample(schedule, model, x, training_target="x0")
    )
    out = f(jnp.ones((1, 4, 4, 1)))
    assert np.isfinite(np.asarray(out)).all()


def test_adaptive_23_constant_and_linear():
    """Adaptive DPM-Solver-23 (reference sampler.py:1006-1032): exact on a
    constant-x0 model, and tracks the linear-ODE reference at least as well
    as adaptive-12."""
    from diff_sal_tpu.diffusion.dpm_solver import adaptive_sample

    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)
    x = jnp.asarray(np.random.RandomState(3).randn(1, 6, 6, 1).astype(np.float32))
    out = adaptive_sample(
        schedule, _const_model(0.4), x, training_target="x0",
        algorithm="dpmsolver++", order=3,
    )
    np.testing.assert_allclose(np.asarray(out), 0.4, atol=2e-3)

    def model(x, t_vec):
        return 0.9 * x

    ns = _ns()
    x_ref = np.asarray(
        _Solver(ns, model, algorithm="dpmsolver++").sample_multistep(
            x, steps=256, order=3
        )
    )
    y23 = np.asarray(
        adaptive_sample(schedule, model, x, training_target="x0",
                        algorithm="dpmsolver++", order=3)
    )
    y12 = np.asarray(
        adaptive_sample(schedule, model, x, training_target="x0",
                        algorithm="dpmsolver++", order=2)
    )
    err23 = np.abs(y23 - x_ref).max()
    err12 = np.abs(y12 - x_ref).max()
    # the higher-order error estimate is tighter at the same tolerances
    # (absolute accuracy is set by atol/rtol, not the order)
    assert err23 <= err12 * 1.1, (err23, err12)
    assert err23 < 0.3, err23


def test_model_wrapper_parameterizations():
    """All four model_type conversions agree with the analytic noise
    predictor for a point-mass-at-c data distribution
    (reference sampler.py:226-268)."""
    from diff_sal_tpu.diffusion.dpm_solver import model_wrapper

    ns = _ns()
    c = 0.3
    t = 0.41
    a, s = float(ns.marginal_alpha(t)), float(ns.marginal_std(t))
    x = jnp.asarray(np.random.RandomState(4).randn(2, 4, 4, 1).astype(np.float32))
    eps_true = (x - a * c) / s

    makers = {
        "noise": lambda x, tv, cond: (x - a * c) / s,
        "x_start": lambda x, tv, cond: jnp.full_like(x, c),
        "v": lambda x, tv, cond: a * (x - a * c) / s - s * c * jnp.ones_like(x),
        "score": lambda x, tv, cond: -(x - a * c) / (s * s),
    }
    for mt, fn in makers.items():
        eps_fn = model_wrapper(fn, ns, model_type=mt)
        np.testing.assert_allclose(
            np.asarray(eps_fn(x, t)), np.asarray(eps_true), atol=1e-4,
            err_msg=mt,
        )
        # t_input passed to the network is the discrete model time
        def check_t(xa, tv, cond, mt=mt):
            np.testing.assert_allclose(
                float(tv[0]), ns.model_input_time(t), rtol=1e-6
            )
            return makers[mt](xa, tv, cond)

        model_wrapper(check_t, ns, model_type=mt)(x, t)


def test_model_wrapper_classifier_free_guidance():
    from diff_sal_tpu.diffusion.dpm_solver import model_wrapper

    ns = _ns()
    x = jnp.ones((1, 4, 4, 1))

    def fn(x, tv, cond):
        return jnp.full_like(x, 0.0 if cond is None else float(cond))

    eps = model_wrapper(
        fn, ns, guidance_type="classifier-free", condition=1.0,
        unconditional_condition=None, guidance_scale=2.0,
    )(x, 0.5)
    # no uncond condition -> plain conditional call
    np.testing.assert_allclose(np.asarray(eps), 1.0)

    eps2 = model_wrapper(
        fn, ns, guidance_type="classifier-free", condition=1.0,
        unconditional_condition=-1.0, guidance_scale=2.0,
    )(x, 0.5)
    # e_uncond + s*(e_cond - e_uncond) = -1 + 2*(1 - (-1)) = 3
    np.testing.assert_allclose(np.asarray(eps2), 3.0)

    # scale 1 short-circuits to the conditional branch
    eps3 = model_wrapper(
        fn, ns, guidance_type="classifier-free", condition=0.25,
        unconditional_condition=-1.0, guidance_scale=1.0,
    )(x, 0.5)
    np.testing.assert_allclose(np.asarray(eps3), 0.25)


def test_model_wrapper_classifier_guidance():
    """eps_guided = eps - scale * sigma * grad_x log p(c|x)
    (reference sampler.py:205-216, 290-299)."""
    from diff_sal_tpu.diffusion.dpm_solver import model_wrapper

    ns = _ns()
    t = 0.5
    s = float(ns.marginal_std(t))
    x = jnp.asarray(np.random.RandomState(5).randn(1, 4, 4, 1).astype(np.float32))

    def fn(x, tv, cond):
        return jnp.zeros_like(x)

    def classifier_fn(x, tv, cond):
        # log p = -0.5 * ||x||^2 -> grad = -x
        return -0.5 * jnp.sum(x.reshape(x.shape[0], -1) ** 2, axis=1)

    eps = model_wrapper(
        fn, ns, guidance_type="classifier", classifier_fn=classifier_fn,
        guidance_scale=3.0,
    )(x, t)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(3.0 * s * x),
                               atol=1e-5)


def test_model_wrapper_drives_solver():
    """A wrapped noise predictor plugs into _Solver(continuous_time=True) and
    recovers the point mass."""
    from diff_sal_tpu.diffusion.dpm_solver import model_wrapper

    ns = _ns()
    c = 0.25

    def fn(x, tv, cond):
        t_cont = float(tv[0]) / 1000.0 + 1.0 / ns.total_N
        a, s = ns.marginal_alpha(t_cont), ns.marginal_std(t_cont)
        return (x - a * c) / s

    eps_fn = model_wrapper(fn, ns, model_type="noise")
    sol = _Solver(ns, eps_fn, algorithm="dpmsolver", training_target="noise",
                  continuous_time=True)
    x = jnp.asarray(np.random.RandomState(6).randn(1, 4, 4, 1).astype(np.float32))
    y = sol.sample_multistep(x, steps=10, order=2)
    y = sol.denoise_to_zero(y)
    np.testing.assert_allclose(np.asarray(y), c, atol=1e-3)


def test_dpm_solver_sample_with_wrapped_guidance():
    """dpm_solver_sample(wrapped_eps_fn=...) runs a model_wrapper result
    through the config-driven entry (guided sampling glue)."""
    from diff_sal_tpu.diffusion.dpm_solver import model_wrapper

    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)
    ns = _ns()
    c = 0.3

    def fn(x, tv, cond):
        # x0-predictor conditioned on cond (point mass at cond)
        return jnp.full_like(x, float(cond))

    eps_fn = model_wrapper(
        fn, ns, model_type="x_start", guidance_type="classifier-free",
        condition=c, unconditional_condition=c, guidance_scale=2.0,
    )
    cfg = SamplingConfig(
        sample_type="dpmsolver++", timesteps=5, dpm_solver_order=2,
        dpm_solver_method="multistep", denoise=True,
    )
    x = jnp.ones((1, 4, 4, 1))
    out = dpm_solver_sample(
        schedule, None, x, sampling=cfg, wrapped_eps_fn=eps_fn
    )
    np.testing.assert_allclose(np.asarray(out), c, atol=2e-3)


def test_adaptive_sample_with_wrapped_guidance():
    """adaptive_sample(wrapped_eps_fn=...) — the model_wrapper/adaptive
    pairing the reference uses for guided sampling (sampler.py:1091-1099).
    The wrapper's alpha/sigma conversions must accept the while_loop's
    traced times (jnp.interp path) and the host-float final denoise."""
    from diff_sal_tpu.diffusion.dpm_solver import adaptive_sample, model_wrapper

    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)
    ns = _ns()
    c = 0.35

    def fn(x, tv, cond):
        return jnp.full_like(x, float(cond))

    eps_fn = model_wrapper(
        fn, ns, model_type="x_start", guidance_type="classifier-free",
        condition=c, unconditional_condition=c, guidance_scale=2.0,
    )
    x = jnp.asarray(np.random.RandomState(1).randn(2, 6, 6, 1).astype(np.float32))
    for order in (2, 3):
        out = adaptive_sample(
            schedule, None, x, algorithm="dpmsolver++", order=order,
            wrapped_eps_fn=eps_fn,
        )
        np.testing.assert_allclose(np.asarray(out), c, atol=2e-3)


def test_adaptive_error_is_per_sample_rms_max():
    """Step-acceptance error = max over batch of per-sample RMS (reference
    sampler.py:1001-1002): a batch with one hard sample must take at least
    as many accepted steps as the hard sample alone (a whole-batch RMS
    would dilute the hard sample's error and accept looser steps)."""
    import jax

    from diff_sal_tpu.diffusion.dpm_solver import adaptive_sample

    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)

    def model(x, t_vec):
        return 0.9 * x  # linear ODE: per-sample error scales with |x|

    rs = np.random.RandomState(7)
    easy = 0.01 * rs.randn(1, 6, 6, 1).astype(np.float32)
    hard = 5.0 + rs.randn(1, 6, 6, 1).astype(np.float32)
    ref = np.asarray(
        _Solver(_ns(), model, algorithm="dpmsolver++").sample_multistep(
            jnp.asarray(hard), steps=256, order=2
        )
    )
    mixed = np.concatenate([easy, hard], axis=0)
    out_mixed = np.asarray(
        adaptive_sample(schedule, model, jnp.asarray(mixed),
                        algorithm="dpmsolver++")
    )[1:]
    out_solo = np.asarray(
        adaptive_sample(schedule, model, jnp.asarray(hard),
                        algorithm="dpmsolver++")
    )
    # the hard sample's accuracy must not degrade from sharing a batch with
    # an easy sample
    err_mixed = np.abs(out_mixed - ref).max()
    err_solo = np.abs(out_solo - ref).max()
    assert err_mixed <= err_solo * 1.05 + 1e-4, (err_mixed, err_solo)
