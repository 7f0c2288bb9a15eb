"""Masked-program attribution: where the 24 ms/2048 over dense goes.

Round-4 verdict item 4: the masked program sits at ~0.87x baseline and
never got the dense path's optimization discipline. This ablates its
cost components IN CONTEXT by loading variant copies of
``models/layers.py`` with one mechanism disabled at a time (exactness
deliberately broken — attribution only; candidates get exact
implementations afterwards):

  dense          assume_dense=True floor (no mask anywhere)
  masked         the real masked program (ceiling)
  -multiply      apply_mask() = identity (drops the per-layer
                 (B,F,L,C) x mask elementwise multiplies)
  -validcount    the k-shifted-add valid-count chain replaced by one
                 strided slice per conv (keeps the multiplies)
  -nmdmask       NMDLayer ignores the mask (dense reductions)
  -dytmask       MaskedDYT ignores the mask
  -poolmask      masked pooling ignores the mask

Measurement discipline = bench.py / split_bench.py: in-program RNG
inputs varied per exec, 16 full-size execs per scalar-combine fetch,
best of 3 rounds (relay drift is +-20% under that).

Usage: python experiments/masked_breakdown.py   (runs on the chip)
"""

from __future__ import annotations

import importlib.util
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BS = 2048

LAYERS_PATH = REPO / "jaeger_tpu" / "models" / "layers.py"


def _variant_module(name: str, replacements: list[tuple[str, str]]):
    """Load a copy of models/layers.py with textual replacements applied
    and return it as a fresh module (asserts every anchor matched)."""
    src = LAYERS_PATH.read_text()
    for old, new in replacements:
        assert old in src, f"anchor not found for {name}: {old[:60]!r}"
        src = src.replace(old, new)
    spec = importlib.util.spec_from_loader(f"layers_{name}", loader=None)
    mod = importlib.util.module_from_spec(spec)
    mod.__file__ = str(LAYERS_PATH)
    sys.modules[f"layers_{name}"] = mod
    exec(compile(src, str(LAYERS_PATH), "exec"), mod.__dict__)
    return mod


_MULTIPLY = [(
    "    return x * mask[..., None].astype(x.dtype)",
    "    return x  # ABLATED: mask multiply",
)]

_VALIDCOUNT = [(
    """            mc = sum(
                jax.lax.slice_in_dim(
                    mi, j * self.dilation_rate,
                    j * self.dilation_rate + (out_len_m - 1) * self.strides + 1,
                    stride=self.strides, axis=2,
                )
                for j in range(self.kernel_size)
            )
            if self.mask_mode == "any":
                out_mask = mc > 0
            elif self.mask_mode == "majority":
                out_mask = mc >= (self.kernel_size + 1) // 2
            else:
                out_mask = mc == self.kernel_size""",
    """            out_mask = jax.lax.slice_in_dim(
                mi, 0, (out_len_m - 1) * self.strides + 1,
                stride=self.strides, axis=2) > 0  # ABLATED: one slice""",
)]


def _ignore_mask_in(class_name: str):
    """Force mask=None at the top of ONE class's __call__."""
    src = LAYERS_PATH.read_text()
    m = re.search(rf"class {class_name}\(.*?(?=\nclass |\Z)", src,
                  re.DOTALL)
    assert m, class_name
    body = m.group(0)
    anchor = "def __call__(self, x, mask=None, train: bool = False):"
    assert anchor in body, f"no standard __call__ in {class_name}"
    patched = body.replace(
        anchor, anchor + "\n        mask = None  # ABLATED", 1)
    return [(body, patched)]


def timeit(model, variables, crop_nt, dense: bool, batch: int = BS):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def one(variables, seed):
        k1, k2 = jax.random.split(seed)
        bases = jax.random.randint(
            k1, (batch, crop_nt), 0, 4, dtype=jnp.int32).astype(jnp.uint8)
        if not dense:
            # base id 4 = N -> token 0 -> masked (ids 5-8 are soft-masked
            # lowercase and fold back to ACGT when the masking flag is off)
            start = jax.random.randint(k2, (batch, 1), 0,
                                       crop_nt - 64, jnp.int32)
            pos = jnp.arange(crop_nt)[None, :]
            bases = jnp.where((pos >= start) & (pos < start + 48),
                              jnp.uint8(4), bases).astype(jnp.uint8)
        lengths = jnp.full((batch,), crop_nt, jnp.int32)
        kw = {"assume_dense": True} if dense else {}
        out = model.apply(variables, {"bases": bases, "lengths": lengths},
                          train=False, **kw)
        return jnp.sum(out["prediction"].astype(jnp.float32))

    @jax.jit
    def combine(accs):
        return jnp.sum(jnp.stack(accs))

    _ = float(combine([one(variables, jax.random.PRNGKey(0))]))
    best = float("inf")
    for it in range(3):
        t0 = time.perf_counter()
        accs = [one(variables, jax.random.PRNGKey(it * 16 + j + 1))
                for j in range(16)]
        _ = float(combine(accs))
        best = min(best, (time.perf_counter() - t0) / 16)
    return best * 1000


def build_with(layers_mod):
    """Build the flagship with a (possibly patched) layers module.

    IMPORTANT: the builder resolves ``L.MaskedConv1D`` etc. at *apply*
    time, not init time, so the patch must stay active for the whole
    build+measure window — this returns an ``unpatch()`` closure the
    caller invokes after timing (the first run of this probe restored
    inside build and silently measured the unpatched program 7 times).
    ``POOLERS`` is a dict of classes, patched entry-wise.
    """
    import jax.numpy as jnp

    from jaeger_tpu.models import builder as builder_mod
    from jaeger_tpu.models import layers as real_layers
    from jaeger_tpu.models.flagship import flagship_config

    saved = {}
    if layers_mod is not real_layers:
        for name in dir(layers_mod):
            obj = getattr(layers_mod, name)
            if (isinstance(obj, type) or callable(obj) or name == "POOLERS"):
                if hasattr(real_layers, name):
                    saved[name] = getattr(real_layers, name)
                    setattr(real_layers, name, obj)

    def unpatch():
        for name, obj in saved.items():
            setattr(real_layers, name, obj)

    try:
        b = builder_mod.ModelBuilder(flagship_config(), dtype=jnp.bfloat16)
        model, variables = b.init(batch=1)
        _, crop_nt = b.crop
    except BaseException:
        unpatch()
        raise
    return model, variables, crop_nt, unpatch


def main() -> None:
    from jaeger_tpu.models import layers as real_layers

    variants = [
        ("masked", real_layers, False),
        ("dense", real_layers, True),
        ("-multiply", _variant_module("nomul", _MULTIPLY), False),
        ("-validcount", _variant_module("novc", _VALIDCOUNT), False),
        ("-nmdmask", _variant_module("nonmd", _ignore_mask_in("NMDLayer")),
         False),
        ("-dytmask", _variant_module("nodyt",
                                     _ignore_mask_in("MaskedDYT")), False),
        ("-poolmask", _variant_module(
            "nopool", _ignore_mask_in("MaskedGlobalMaxPooling")), False),
    ]
    results = {}
    base = None
    for name, mod, dense in variants:
        model, variables, crop_nt, unpatch = build_with(mod)
        try:
            ms = timeit(model, variables, crop_nt, dense)
        finally:
            unpatch()
        results[name] = ms
        if name == "masked":
            base = ms
        delta = f"  ({base - ms:+.1f} ms vs masked)" if base and name != "masked" else ""
        print(f"{name:12s} {ms:7.2f} ms/2048{delta}", flush=True)
    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
