"""torch -> flax zoo-weight conversion round-trip.

Builds a torch model with the reference checkpoints' exact architecture and
key names (WideResNet34 pre-act backbone + linear heads; reference
models/wide_resnet.py:29-133, pose_rigid.py:314-334), randomizes weights
AND BatchNorm running stats, converts with interop.torch_convert, and
checks the flax net_forward matches the torch forward."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from megapose6d_tpu.interop import (  # noqa: E402
    change_keys_of_older_models,
    pose_predictor_params_from_torch,
)
from megapose6d_tpu.models.pose_predictor import (  # noqa: E402
    PosePredictor,
    PosePredictorConfig,
)


class TorchBlockV2(torch.nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.bn1 = torch.nn.BatchNorm2d(cin)
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.downsample = (
            torch.nn.Conv2d(cin, cout, 1, stride, bias=False)
            if (stride != 1 or cin != cout)
            else None
        )

    def forward(self, x):
        out = torch.relu(self.bn1(x))
        residual = self.downsample(out) if self.downsample is not None else x
        out = self.conv1(out)
        out = torch.relu(self.bn2(out))
        out = self.conv2(out)
        return out + residual


class TorchZooBackbone(torch.nn.Module):
    def __init__(self, n_inputs, stages=(3, 4, 6, 3), width=64):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(n_inputs, width, 5, 2, 2, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(width)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        cin = width
        for i, n_blocks in enumerate(stages):
            cout = width * (2**i)
            blocks = []
            for b in range(n_blocks):
                stride = 2 if (i > 0 and b == 0) else 1
                blocks.append(TorchBlockV2(cin, cout, stride))
                cin = cout
            setattr(self, f"layer{i + 1}", torch.nn.Sequential(*blocks))

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        return x


class TorchZooPosePredictor(torch.nn.Module):
    def __init__(self, n_inputs, pose_dim=9):
        super().__init__()
        self.backbone = TorchZooBackbone(n_inputs)
        self.pose_fc = torch.nn.Linear(512, pose_dim)

    def forward(self, x):
        feats = self.backbone(x)
        pooled = feats.flatten(2).mean(dim=-1)
        return self.pose_fc(pooled)


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(1 + 0.2 * torch.randn(m.weight.shape, generator=g))
                m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=g))
                m.running_mean.copy_(
                    0.2 * torch.randn(m.running_mean.shape, generator=g)
                )
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5
                )
            elif isinstance(m, (torch.nn.Conv2d, torch.nn.Linear)):
                fan_in = int(np.prod(m.weight.shape[1:]))
                m.weight.copy_(
                    (2.0 / fan_in) ** 0.5
                    * torch.randn(m.weight.shape, generator=g)
                )
                if m.bias is not None:
                    m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=g))


@pytest.mark.slow
def test_zoo_roundtrip_net_forward_matches_torch():
    C = 9  # refiner RGB 1-view: (3 obs) + (3 rgb + 3 normals) * 1 view
    tm = TorchZooPosePredictor(C).eval()
    _randomize(tm)
    variables = pose_predictor_params_from_torch(tm.state_dict())

    cfg = PosePredictorConfig(
        backbone="zoo_resnet34",
        render_size=(32, 48),
        n_rendered_views=1,
        multiview_type="TCO+front_1view",
        render_normals=True,
        predict_pose_update=True,
        predict_rendered_views_logits=False,
    )
    model = PosePredictor(cfg)

    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 80, C).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    out = model.apply(
        variables, jnp.asarray(x), method=PosePredictor.net_forward
    )
    np.testing.assert_allclose(
        np.asarray(out["pose"]),
        ref,
        rtol=1e-4,
        atol=1e-4 * max(1.0, float(np.abs(ref).max())),
    )


def test_converter_rejects_unknown_keys():
    with pytest.raises((ValueError, KeyError)):
        pose_predictor_params_from_torch(
            {
                "backbone.conv1.weight": np.zeros((64, 3, 5, 5)),
                "backbone.bn1.weight": np.zeros(64),
                "backbone.bn1.bias": np.zeros(64),
                "backbone.bn1.running_mean": np.zeros(64),
                "backbone.bn1.running_var": np.ones(64),
                "mystery.layer.weight": np.zeros(3),
            }
        )


def test_old_key_shim():
    sd = {
        "backbone.backbone.conv1.weight": 1,
        "backbone.head.0.weight": 2,
        "pose_fc.bias": 3,
    }
    out = change_keys_of_older_models(sd)
    assert out == {
        "backbone.conv1.weight": 1,
        "views_logits_head.weight": 2,
        "pose_fc.bias": 3,
    }


def test_zoo_backbone_trainable_bn_overfit():
    """zoo backbone train-mode: BN batch_stats update under
    mutable=['batch_stats'] and a few SGD steps overfit a tiny batch
    (the reference fine-tunes these BN backbones with SyncBN,
    train_megapose.py:243-244)."""
    import optax

    from megapose6d_tpu.models.backbones import make_backbone

    model = make_backbone("zoo_resnet18-train", n_features=512)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 32, 32, 9))
    y = jax.random.normal(jax.random.PRNGKey(1), (4, 512)) * 0.1
    variables = model.init(rng, x)
    params, batch_stats = variables["params"], variables["batch_stats"]

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x,
                mutable=["batch_stats"],
            )
            return jnp.mean((out - y) ** 2), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state)
        return (
            optax.apply_updates(params, updates),
            new_stats,
            opt_state,
            loss,
        )

    losses = []
    for _ in range(30):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state
        )
        losses.append(float(loss))

    # BN running stats moved away from init (mean 0 / var 1).
    leaf = batch_stats["bn1"]["mean"]
    assert float(jnp.abs(leaf).max()) > 1e-4
    assert losses[-1] < 0.5 * losses[0], losses[:: len(losses) // 5]

    # Inference-mode apply (train=False path) consumes the updated stats
    # without mutation.
    infer = make_backbone("zoo_resnet18", n_features=512)
    out = infer.apply({"params": params, "batch_stats": batch_stats}, x)
    assert out.shape == (4, 512) and bool(jnp.isfinite(out).all())
