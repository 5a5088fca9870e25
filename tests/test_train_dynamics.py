"""Step-level training-dynamics oracle: the optax trainer vs a literal torch
loop with the reference's exact semantics, on identical weights and batch
order.

The component tests (test_model_head) pin each piece — loss formula, porter,
metrics, scalers.  These pin the COMPOSITION over many optimization steps:
torch SGD's weight-decay->momentum coupling, Adam's L2 grad shaping,
CosineAnnealingLR/StepLR stepping, the reference's COUPLED
scheduler+SWALR stepping (``model_regression.py:408-416`` steps both every
SWA epoch), train-mode BN buffer updates, swa_utils.update_bn's cumulative
averages, and AveragedModel's equal parameter average.

Dropout is 0 throughout so torch/jax RNG streams are irrelevant; everything
else runs the real code paths.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from relaxtpu.model.mlp import port_torch_mlp  # noqa: E402
from relaxtpu.model.train import (  # noqa: E402
    MlpTrainer,
    ModelSnapshot,
    TrainConfig,
    reference_lr_sequence,
)
from test_model_head import TorchMlp, torch_mae_rank  # noqa: E402

D, H, BS, N = 24, 16, 8, 48


def _data(seed=0):
    r = np.random.default_rng(seed)
    x = r.normal(0, 1, (N, D)).astype(np.float32)
    y = (50 + 10 * (3 * x[:, 0] + x[:, 1]) + r.normal(0, 1, N)).astype(np.float32)
    return x, y


def _torch_reference_lrs(cfg: TrainConfig, swa_start_frac: float) -> list[float]:
    """The lr used each epoch by REAL torch schedulers stepped the way the
    reference loop steps them (base scheduler every epoch, SWALR additionally
    once SWA engages)."""
    from torch.optim.lr_scheduler import CosineAnnealingLR, StepLR
    from torch.optim.swa_utils import SWALR

    m = torch.nn.Linear(2, 1)
    if cfg.optimizer_type == "sgd":
        opt = torch.optim.SGD(m.parameters(), lr=cfg.initial_lr, momentum=0.9)
        sched = CosineAnnealingLR(opt, T_max=cfg.epochs, eta_min=cfg.eta_min)
    else:
        opt = torch.optim.Adam(m.parameters(), lr=cfg.initial_lr)
        sched = StepLR(opt, step_size=2, gamma=0.95)
    swa = SWALR(opt, swa_lr=cfg.initial_lr, anneal_strategy="cos") if cfg.use_swa else None
    swa_start = int(cfg.epochs * swa_start_frac) if cfg.use_swa else cfg.epochs
    lrs = []
    for e in range(cfg.epochs):
        lrs.append(float(opt.param_groups[0]["lr"]))
        sched.step()
        if swa is not None and e >= swa_start:
            swa.step()
    return lrs


@pytest.mark.parametrize(
    "optimizer_type,use_swa,epochs,frac",
    [
        ("sgd", True, 20, 0.7),
        ("sgd", False, 20, 0.7),
        ("adam", True, 20, 0.7),
        ("sgd", True, 12, 0.75),  # the fine-tune shape
        ("sgd", True, 30, 0.5),  # SWA phase longer than anneal_epochs
    ],
)
def test_lr_sequence_matches_torch_composite(optimizer_type, use_swa, epochs, frac):
    cfg = TrainConfig(
        optimizer_type=optimizer_type, use_swa=use_swa, epochs=epochs,
        swa_start_frac=frac, initial_lr=0.1,
    )
    ours = reference_lr_sequence(cfg)
    want = _torch_reference_lrs(cfg, frac)
    np.testing.assert_allclose(ours, want, rtol=1e-10)


def _run_ours(cfg: TrainConfig, torch_model, x, y, perms):
    """Drive MlpTrainer exactly as train_and_evaluate does, with given perms."""
    trainer = MlpTrainer(cfg, D)
    variables = port_torch_mlp(torch_model.state_dict())
    params = jax.tree.map(jnp.asarray, variables["params"])
    batch_stats = jax.tree.map(jnp.asarray, variables.get("batch_stats", {}))
    opt_state = trainer.tx.init(params)
    key = jax.random.PRNGKey(0)  # dropout keys are dead at drop_rate=0
    lrs = reference_lr_sequence(cfg)
    losses = []
    for e in range(cfg.epochs):
        opt_state.hyperparams["lr"] = jnp.asarray(lrs[e], jnp.float32)
        params, batch_stats, opt_state, tot, key = trainer.train_epoch(
            params, batch_stats, opt_state, jnp.asarray(x), jnp.asarray(y), perms[e], key
        )
        losses.append(tot / len(x))
    return params, batch_stats, losses


def _run_torch(cfg: TrainConfig, model, x, y, perms):
    """The reference loop, literally (torch optimizer + scheduler objects)."""
    from torch.optim.lr_scheduler import CosineAnnealingLR, StepLR

    if cfg.optimizer_type == "sgd":
        opt = torch.optim.SGD(
            model.parameters(), lr=cfg.initial_lr, momentum=0.9,
            weight_decay=cfg.weight_decay,
        )
        sched = CosineAnnealingLR(opt, T_max=cfg.epochs, eta_min=cfg.eta_min)
    else:
        opt = torch.optim.Adam(
            model.parameters(), lr=cfg.initial_lr, weight_decay=cfg.weight_decay
        )
        sched = StepLR(opt, step_size=2, gamma=0.95)
    losses = []
    for e in range(cfg.epochs):
        model.train()
        tot = 0.0
        for i in range(0, N, BS):
            idx = perms[e][i : i + BS]
            xb = torch.tensor(x[idx])
            yb = torch.tensor(y[idx]).reshape(-1, 1)
            opt.zero_grad()
            loss = torch_mae_rank(model(xb), yb, cfg.l1_w, cfg.rank_w)
            loss.backward()
            opt.step()
            tot += loss.item() * len(idx)
        sched.step()
        losses.append(tot / N)
    return losses


def _assert_params_match(params, batch_stats, model, rtol=2e-3, atol=2e-4):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    for name in ("fc1", "fc2", "fc3"):
        np.testing.assert_allclose(
            np.asarray(params[name]["kernel"]), sd[f"{name}.weight"].T,
            rtol=rtol, atol=atol, err_msg=f"{name}.weight",
        )
        np.testing.assert_allclose(
            np.asarray(params[name]["bias"]), sd[f"{name}.bias"],
            rtol=rtol, atol=atol, err_msg=f"{name}.bias",
        )
    if "bn1" in params:
        np.testing.assert_allclose(
            np.asarray(params["bn1"]["scale"]), sd["bn1.weight"], rtol=rtol, atol=atol
        )
        np.testing.assert_allclose(
            np.asarray(params["bn1"]["bias"]), sd["bn1.bias"], rtol=rtol, atol=atol
        )
        np.testing.assert_allclose(
            np.asarray(batch_stats["bn1"]["mean"]), sd["bn1.running_mean"],
            rtol=rtol, atol=atol,
        )
        np.testing.assert_allclose(
            np.asarray(batch_stats["bn1"]["var"]), sd["bn1.running_var"],
            rtol=rtol, atol=atol,
        )


@pytest.mark.parametrize("optimizer_type", ["sgd", "adam"])
def test_optimizer_dynamics_match_torch(optimizer_type):
    """E epochs of real optimization land on the same parameters, BN buffers,
    and per-epoch losses as the literal torch loop."""
    cfg = TrainConfig(
        optimizer_type=optimizer_type, use_swa=False, epochs=4, batch_size=BS,
        hidden_features=H, drop_rate=0.0, initial_lr=0.02, weight_decay=0.005,
    )
    x, y = _data()
    torch.manual_seed(0)
    model = TorchMlp(D, hidden=H, drop=0.0)
    r = np.random.default_rng(7)
    perms = [r.permutation(N) for _ in range(cfg.epochs)]

    params, batch_stats, ours_losses = _run_ours(cfg, model, x, y, perms)
    torch_losses = _run_torch(cfg, model, x, y, perms)

    np.testing.assert_allclose(ours_losses, torch_losses, rtol=1e-3)
    _assert_params_match(params, batch_stats, model)


def test_update_bn_matches_torch_swa_utils():
    """trainer.update_bn == torch.optim.swa_utils.update_bn on the same
    weights and batch order (cumulative average, unbiased batch var)."""
    x, _ = _data(3)
    torch.manual_seed(1)
    model = TorchMlp(D, hidden=H, drop=0.0)
    cfg = TrainConfig(batch_size=BS, hidden_features=H, drop_rate=0.0)
    trainer = MlpTrainer(cfg, D)
    variables = port_torch_mlp(model.state_dict())
    snap = ModelSnapshot(variables["params"], variables["batch_stats"])

    seed = 11
    got = trainer.update_bn(snap, x, np.random.default_rng(seed))

    idx = np.random.default_rng(seed).permutation(N)
    batches = [torch.tensor(x[idx[i : i + BS]]) for i in range(0, N, BS)]
    torch.optim.swa_utils.update_bn(batches, model)

    np.testing.assert_allclose(
        np.asarray(got.batch_stats["bn1"]["mean"]),
        model.bn1.running_mean.numpy(), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got.batch_stats["bn1"]["var"]),
        model.bn1.running_var.numpy(), rtol=1e-5, atol=1e-6,
    )


def test_swa_equal_average_matches_torch_averagedmodel():
    """The incremental equal average in train_and_evaluate ==
    AveragedModel.update_parameters' default avg_fn."""
    torch.manual_seed(2)
    model = TorchMlp(D, hidden=H, drop=0.0)
    swa_model = torch.optim.swa_utils.AveragedModel(model)

    swa_params, swa_n = None, 0
    r = np.random.default_rng(5)
    for _ in range(4):
        with torch.no_grad():
            for p in model.parameters():
                p.add_(torch.tensor(r.normal(0, 0.1, p.shape).astype(np.float32)))
        swa_model.update_parameters(model)
        p_now = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
        if swa_params is None:
            swa_params, swa_n = p_now, 1
        else:
            swa_n += 1
            swa_params = {
                k: a + (p_now[k] - a) / swa_n for k, a in swa_params.items()
            }
    for k, v in swa_model.module.state_dict().items():
        if "running" in k or "num_batches" in k:
            continue  # use_buffers=False: buffers are not averaged
        np.testing.assert_allclose(swa_params[k], v.detach().numpy(), rtol=1e-6,
                                   err_msg=k)


def test_reference_lr_dips_then_climbs_in_swa_phase():
    """Characterization: the coupled schedulers make the SWA-phase lr
    non-monotone (dip below the handoff lr, then climb toward initial_lr) —
    the clean-anneal model this replaced rose monotonically from epoch one."""
    cfg = TrainConfig(optimizer_type="sgd", use_swa=True, epochs=20,
                      swa_start_frac=0.7, initial_lr=0.1)
    lrs = reference_lr_sequence(cfg)
    swa = lrs[14:]
    assert swa[1] < swa[0]  # the dip
    assert swa[-1] > swa[1]  # the climb
    assert math.isclose(lrs[0], 0.1)
