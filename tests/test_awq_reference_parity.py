"""Differential parity against the REFERENCE torch AWQ implementation.

The reference's de-facto acceptance evidence is its published ppl tables;
none of those checkpoints are downloadable here. What IS runnable offline
is the reference search code itself (`/root/reference/awq/quantize/
{auto_scale,auto_clip,quantizer}.py`, pure torch, CPU-safe once the
`.cuda()` calls are shimmed). This test runs BOTH pipelines on an
identical tiny llama — same weights, same calibration activations — and
asserts the searched scales, clip ranges, and final pseudo-quantized
weights agree. That is the offline backing for the claim that published
ppl deltas carry over (`awq_tpu/quant/awq.py:15`).

Reference call shape mirrored here: per-layer loop of `run_awq`
(`awq/quantize/pre_quant.py:174-238`): capture linear inputs by forward
hook, `auto_scale_block` -> `apply_scale` -> `auto_clip_block` ->
`apply_clip`, with the next layer's input computed from ORIGINAL weights.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types
from collections import defaultdict
import functools

import numpy as np
import pytest

pytestmark = pytest.mark.heavy

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from awq_tpu.config import QuantConfig  # noqa: E402
from awq_tpu.models.hf_import import import_hf_model  # noqa: E402
from awq_tpu.models.llama import pseudo_quantize_params  # noqa: E402
from awq_tpu.quant.awq import clips_by_layer, run_awq  # noqa: E402

GROUP = 32  # w_bit is a test parameter (INT4 + INT3 parity)


def _stub_module(name, path=None):
    if name in sys.modules:
        return
    m = types.ModuleType(name)
    if path:
        m.__path__ = [path]
        spec = importlib.machinery.ModuleSpec(name, None, is_package=True)
        spec.submodule_search_locations = [path]
        m.__spec__ = spec
    else:
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = m


@pytest.fixture(scope="module")
def ref():
    """Import the reference quantize modules (bypassing the package
    __init__, which pulls a compiled CUDA extension)."""
    sys.path.insert(0, "/root/reference")
    _stub_module("awq", "/root/reference/awq")
    _stub_module("awq.quantize", "/root/reference/awq/quantize")
    _stub_module("awq.utils", "/root/reference/awq/utils")
    _stub_module("awq_inference_engine")  # only used by WQLinear.forward
    import awq.quantize.auto_clip as auto_clip
    import awq.quantize.auto_scale as auto_scale
    import awq.quantize.quantizer as quantizer

    return types.SimpleNamespace(
        auto_scale=auto_scale, auto_clip=auto_clip, quantizer=quantizer
    )


@pytest.fixture()
def cpu_cuda_shim(monkeypatch):
    """The reference hardcodes `.cuda()` / `torch.cuda.empty_cache()`
    (`auto_clip.py:77`, `pre_quant.py:131`); shim them to no-ops so the
    search runs on this CPU-only torch build."""
    monkeypatch.setattr(torch.nn.Module, "cuda",
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.cuda, "empty_cache", lambda: None,
                        raising=False)


def _tiny_hf_llama():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=512, rope_theta=10000.0,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    torch.manual_seed(7)
    return transformers.LlamaForCausalLM(hf_cfg).eval().float()


def _catch_layer0_input(model, samples):
    """Reference Catcher (`pre_quant.py:137-160`): grab layer 0's input
    hidden states and the kwargs every decoder layer receives."""
    layers = model.model.layers
    caught = {}

    class Catch(torch.nn.Module):
        def __init__(self, m):
            super().__init__()
            self.m = m

        def forward(self, inp, **kw):
            caught["inp"] = inp
            caught["kw"] = kw
            raise ValueError

    layers[0] = Catch(layers[0])
    try:
        model(torch.from_numpy(samples).long(), use_cache=False)
    except ValueError:
        pass
    layers[0] = layers[0].m
    # the reference pops use_cache (`auto_scale.py:105`); additionally
    # drop cache objects a modern transformers threads through — a live
    # DynamicCache would otherwise be appended to 21x during the ratio
    # sweep (the pinned-version reference passed past_key_value=None)
    kw = {k: v for k, v in caught["kw"].items()
          if k in ("attention_mask", "position_ids", "position_embeddings",
                   "cache_position")}
    return caught["inp"], kw


def _run_reference(ref, model, samples, w_bit):
    q_config = dict(zero_point=True, q_group_size=GROUP)
    h, layer_kwargs = _catch_layer0_input(model, samples)
    per_layer = []
    for layer in model.model.layers:
        named = {n: m for n, m in layer.named_modules()
                 if isinstance(m, torch.nn.Linear)}
        feats = defaultdict(list)

        def hook(m, x, y, name):
            feats[name].append(x[0].detach())

        handles = [m.register_forward_hook(functools.partial(hook, name=n))
                   for n, m in named.items()]
        with torch.no_grad():
            out = layer(h, **layer_kwargs)
        h = out[0] if isinstance(out, tuple) else out
        for hd in handles:
            hd.remove()
        input_feat = {k: torch.cat(v, dim=0) for k, v in feats.items()}

        scales_list = ref.auto_scale.auto_scale_block(
            layer, dict(layer_kwargs), w_bit=w_bit, q_config=q_config,
            input_feat=input_feat,
        )
        ref.auto_scale.apply_scale(layer, scales_list,
                                   input_feat_dict=input_feat)
        clip_list = ref.auto_clip.auto_clip_block(
            layer, w_bit=w_bit, q_config=q_config, input_feat=input_feat
        )
        # snapshot post-scale/pre-clip weights + the post-scale features:
        # needed to evaluate the reference's clip objective for BOTH
        # frameworks' choices (tie adjudication below)
        w_preclip = {n: named[n].weight.data.clone() for n in named}
        feat_snap = {n: input_feat[n].detach().clone() for n in named}
        ref.auto_clip.apply_clip(layer, clip_list)
        qweights = {
            n: ref.quantizer.pseudo_quantize_tensor(
                m.weight.data.clone(), n_bit=w_bit, **q_config
            )
            for n, m in named.items()
        }
        per_layer.append(dict(scales=scales_list, clips=dict(clip_list),
                              qw=qweights, w_preclip=w_preclip,
                              feats=feat_snap))
    return per_layer


def _clip_err(ref, w2d, feat, max_val, w_bit):
    """The reference clip objective (`auto_clip.py:34-54`) evaluated at a
    given per-group ``max_val [co, n_g]``; returns err [co, n_g].

    Evaluated in float64: the fp32 objective is chaotic at the 1e-8 error
    scale (1-ulp weight perturbations flip round-to-nearest ties and move
    a group's measured error by ~40%), so only a fp64 re-evaluation gives
    a stable measure of each pick's true quality."""
    co, ci = w2d.shape
    n_g = ci // GROUP
    x = feat.double().reshape(-1, ci)
    x = x.reshape(1, x.shape[0], n_g, GROUP)
    x = x[:, 0:: max(x.shape[1] // 512, 1)][:, :512]
    w4 = w2d.double().reshape(co, 1, n_g, GROUP)
    org_out = (x * w4).sum(-1)
    mv = max_val.double().reshape(co, 1, n_g, 1)
    cur_w = torch.clamp(w4, -mv, mv)
    q_w = ref.quantizer.pseudo_quantize_tensor(
        cur_w, n_bit=w_bit, zero_point=True, q_group_size=GROUP
    )
    cur_out = (x * q_w).sum(-1)
    return (cur_out - org_out).pow(2).mean(dim=1)


# reference op name -> our param name, in matching group order
SCALE_GROUP_NAMES = ["input_layernorm", "self_attn.v_proj",
                     "post_attention_layernorm", "mlp.up_proj"]
LIN_NAME_MAP = {
    "self_attn.q_proj": "wq", "self_attn.k_proj": "wk",
    "self_attn.v_proj": "wv", "self_attn.o_proj": "wo",
    "mlp.gate_proj": "gate", "mlp.up_proj": "up", "mlp.down_proj": "down",
}


@pytest.mark.parametrize("w_bit", [4, 3])
def test_awq_search_matches_reference(ref, cpu_cuda_shim, w_bit):
    """INT4 AND INT3: the reference ships INT3-g128 search results in
    its model zoo (README.md:158-173) but no 3-bit runtime; the search
    semantics must match at both widths."""
    model = _tiny_hf_llama()
    samples = np.random.RandomState(0).randint(
        0, 256, (2, 256)).astype(np.int64)  # 512 calib tokens total

    # ours first: import_hf_model reads weights BEFORE the reference
    # pipeline mutates them in place
    cfg, params = import_hf_model(model, dtype="float32")
    qcfg = QuantConfig(w_bit=w_bit, group_size=GROUP)
    params_awq, result = run_awq(params, cfg, jnp.asarray(samples), qcfg)

    ref_layers = _run_reference(ref, model, samples, w_bit)

    # --- searched scales -------------------------------------------------
    ours_by_layer = defaultdict(list)
    for i, tagged, lin_names, sc in result.scale:
        ours_by_layer[i].append((tagged, lin_names, np.asarray(sc)))
    for i, rl in enumerate(ref_layers):
        assert len(rl["scales"]) == len(ours_by_layer[i]) == 4
        for gi, ((prev_ref, lins_ref, s_ref), (tag, lins, s_ours)) in enumerate(
                zip(rl["scales"], ours_by_layer[i])):
            assert prev_ref.endswith(SCALE_GROUP_NAMES[gi]), (prev_ref, gi)
            np.testing.assert_allclose(
                s_ours, s_ref.numpy(), rtol=2e-4, atol=1e-6,
                err_msg=f"layer {i} group {tag} vs {prev_ref}",
            )

    # --- clip ranges ------------------------------------------------------
    # The clip grid is discrete, and with random weights the MSE curve is
    # flat near its minimum, so fp noise in the fp32 objective flips
    # near-ties between adjacent grid points (~3% of groups here; the
    # noise makes BOTH implementations' argmins ill-conditioned on those
    # groups, so per-group equality cannot hold). The semantic claim is
    # "both pick an argmin of the SAME objective": (a) the bulk must match
    # exactly, (b) per linear, the TOTAL reconstruction error of our picks
    # under the reference's own objective (fp64-evaluated) must be within
    # 3% of the reference picks' total — the quantity that actually
    # propagates to ppl (measured: ratios 0.998-1.025 on this model).
    clip_ours = {(i, name): np.asarray(mv) for i, name, mv in result.clip}
    clip_match = {}
    n_total = n_flipped = 0
    for i, rl in enumerate(ref_layers):
        for ref_name, mv_ref in rl["clips"].items():
            mine = clip_ours[(i, LIN_NAME_MAP[ref_name])]      # [n_g, OC]
            theirs = mv_ref.numpy()[..., 0].T                  # [n_g, OC]
            close = np.isclose(mine, theirs, rtol=2e-4, atol=1e-6)
            clip_match[(i, ref_name)] = close
            n_total += close.size
            n_flipped += (~close).sum()

            err_mine = _clip_err(
                ref, rl["w_preclip"][ref_name], rl["feats"][ref_name],
                torch.from_numpy(mine.T.copy()), w_bit,
            ).numpy()
            err_ref = _clip_err(
                ref, rl["w_preclip"][ref_name], rl["feats"][ref_name],
                mv_ref[..., 0], w_bit,
            ).numpy()
            # INT3's grid steps are ~2.3x coarser, so each near-tie flip
            # moves the fp64-measured objective further: wider budget
            budget = 1.03 if w_bit >= 4 else 1.10
            assert err_mine.sum() <= err_ref.sum() * budget, (
                i, ref_name, float(err_mine.sum() / err_ref.sum())
            )
    # flip-rate tripwire only (the fp64 objective totals above are the
    # semantic gate): INT3's 8-level grid leaves many groups on near-ties
    # where fp noise decides the argmin — measured 13.5% flips on this
    # random model with objective parity still holding
    assert n_flipped / n_total < (0.06 if w_bit >= 4 else 0.20), (
        n_flipped, n_total)

    # --- final pseudo-quantized weights ----------------------------------
    # on every group whose clip matched: equal except for a <0.2% budget
    # of single-code-step flips (the two fp32 pipelines' scaled weights
    # differ by ~1 ulp, which flips round() at exact .5 ties; a tie flip
    # moves the dequantized value by exactly one step, never more)
    clips = clips_by_layer(result, cfg)
    pq = pseudo_quantize_params(params_awq, qcfg, clips=clips)
    for i, rl in enumerate(ref_layers):
        for ref_name, qw_ref in rl["qw"].items():
            mine = np.asarray(pq["layers"][LIN_NAME_MAP[ref_name]].w[i])
            theirs = qw_ref.numpy().T                          # [in, out]
            if (i, ref_name) in clip_match:  # clip-eligible linear
                ok = clip_match[(i, ref_name)]                 # [n_g, OC]
                mask = np.repeat(ok, GROUP, axis=0)            # [in, out]
            else:  # q/k: never clipped, compared everywhere
                mask = np.ones_like(theirs, bool)
            bad = mask & ~np.isclose(mine, theirs, rtol=1e-4, atol=1e-6)
            assert bad.mean() < 2e-3, (
                f"layer {i} {ref_name}: {bad.sum()}/{bad.size} mismatches")
            if bad.any():
                # one asymmetric-quant code step per group ~= (max-min)/15
                ic, oc = theirs.shape
                g = theirs.reshape(ic // GROUP, GROUP, oc)
                step = (g.max(1) - g.min(1)) / (2 ** w_bit - 1)  # [n_g, oc]
                step_full = np.repeat(step, GROUP, axis=0)
                diff = np.abs(mine - theirs)
                assert (diff[bad] <= step_full[bad] * 1.05 + 1e-7).all(), (
                    f"layer {i} {ref_name}: mismatch exceeds one code step")
