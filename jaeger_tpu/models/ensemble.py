"""Model ensembling.

Parity target: reference ``commands/utils_models.py:11-166``
(``EnsembleModel`` / ``combine_models_core``): combine N trained models'
predictions with majority-vote (MV), SUM, MEAN, or NONE (mean fallback,
as in the reference). The
TPU redesign runs every member inside one jitted program — XLA fuses the
shared device-side encoding; members and combination rule are stored in
an ``ensemble.yaml`` bundle of sub-bundles.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import yaml

from jaeger_tpu.models.artifacts import load_model


class EnsembleModel:
    """Duck-types the (model, variables) pair the inference engine uses:
    ``apply(variables, inputs, train=False)`` with
    ``variables = {"members": [member_variables, ...]}``."""

    def __init__(self, models: list, method: str = "mean"):
        method = method.lower()
        if method not in ("mv", "sum", "mean", "none"):
            raise ValueError(f"unknown combination method {method!r}")
        self.models = models
        self.method = method

    @property
    def masking_enabled(self):
        return any(
            getattr(m, "masking_enabled", True) for m in self.models
        )

    @property
    def crop_nt(self):
        """Largest member crop (None when unknown) — the engine's dense
        fast-path predicate must hold for every member."""
        crops = [getattr(m, "crop_nt", None) for m in self.models]
        if not crops or any(c is None for c in crops):
            return None
        return max(crops)

    def apply(self, variables, inputs, train: bool = False, **kwargs):
        """Reference combination semantics (``utils_models.py:19-76``),
        pinned live in ``tests/test_ensemble_live_parity.py``:

        * keys common to every member are combined; others dropped;
        * ``sum`` sums, ``mean``/``none`` average (none = mean fallback);
        * ``mv`` takes the per-example majority class over member
          argmaxes and emits a prediction vector that is zero except at
          the majority class, which holds the mean of the member logits
          there (every member, not just the voters — the masked
          non-zero count the reference divides by includes them all);
          every other common key is averaged.
        """
        member_vars = variables["members"]
        outs = [
            m.apply(v, inputs, train=train, **kwargs)
            for m, v in zip(self.models, member_vars)
        ]
        common = set(outs[0])
        for o in outs[1:]:
            common &= set(o)
        stacks = {k: jnp.stack([o[k] for o in outs], axis=0)
                  for k in common}  # (M, B, ...)
        if self.method == "sum":
            return {k: jnp.sum(s, axis=0) for k, s in stacks.items()}
        if self.method in ("mean", "none"):
            return {k: jnp.mean(s, axis=0) for k, s in stacks.items()}

        # majority vote
        preds = stacks["prediction"]  # (M, B, C)
        n_classes = preds.shape[-1]
        votes = jax.nn.one_hot(jnp.argmax(preds, axis=-1), n_classes,
                               dtype=preds.dtype)
        majority = jnp.argmax(jnp.sum(votes, axis=0), axis=-1)  # (B,)
        mask = jax.nn.one_hot(majority, n_classes, dtype=preds.dtype)[None]
        masked = preds * mask
        counts = jnp.sum((masked != 0.0).astype(preds.dtype), axis=0)
        majority_means = jnp.sum(masked, axis=0) / jnp.maximum(counts, 1.0)
        result = {k: jnp.mean(s, axis=0) for k, s in stacks.items()}
        result["prediction"] = majority_means
        return result


def combine_models_core(model_paths: list[str], output_path: str,
                        method: str = "mean") -> Path:
    """Bundle N model directories into an ensemble bundle."""
    output_path = Path(output_path)
    output_path.mkdir(parents=True, exist_ok=True)
    members = []
    for i, mp in enumerate(model_paths):
        # validate each member loads
        load_model(mp)
        members.append(str(Path(mp).resolve()))
    (output_path / "ensemble.yaml").write_text(
        yaml.safe_dump({"method": method, "members": members})
    )
    return output_path


def load_ensemble(path: str | Path, dtype=jnp.float32):
    """Load an ensemble bundle -> (EnsembleModel, variables, config, classes)."""
    path = Path(path)
    spec = yaml.safe_load((path / "ensemble.yaml").read_text())
    models, member_vars = [], []
    config = classes = None
    for mp in spec["members"]:
        m, v, cfg, cls = load_model(mp, dtype=dtype)
        models.append(m)
        member_vars.append(v)
        config = config or cfg
        classes = classes or cls
    ens = EnsembleModel(models, method=spec.get("method", "mean"))
    return ens, {"members": member_vars}, config, classes


def is_ensemble(path: str | Path) -> bool:
    return (Path(path) / "ensemble.yaml").exists()
