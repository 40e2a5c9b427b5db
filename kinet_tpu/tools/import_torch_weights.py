"""Reference (torch) checkpoint -> kinet_tpu flax params converter.

Enables switching from the reference with trained weights (the inference-
parity bridge called for in SURVEY §7): maps the reference's state-dict
names (TrackFormer DETR naming, reference train.py:176-243 consumes the
same names for its own resume surgery) onto this framework's param tree.

Layout transforms:
- conv  torch [O, I, kH, kW]      -> flax kernel [kH, kW, I, O]
- linear torch [O, I]             -> flax kernel [I, O]
- MHA in_proj [3D, D] split to q/k/v [D, D] -> [D, heads, head_dim]
- MHA out_proj [D, D]             -> [heads, head_dim, D]
- LayerNorm weight/bias           -> scale/bias
- FrozenBatchNorm buffers         -> copied verbatim

Usage:
    from kinet_tpu.tools.import_torch_weights import import_state_dict
    params = import_state_dict(torch_state_dict, flax_params, nheads=8)
"""
from __future__ import annotations

import re

import numpy as np


def _to_np(v):
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def _set(tree, path, value, strict):
    node = tree
    for k in path[:-1]:
        if k not in node:
            if strict:
                raise KeyError("/".join(path))
            return False
        node = node[k]
    leaf = path[-1]
    if leaf not in node:
        if strict:
            raise KeyError("/".join(path))
        return False
    have = np.asarray(node[leaf])
    if have.shape != value.shape:
        if strict:
            raise ValueError(f"{'/'.join(path)}: {have.shape} vs {value.shape}")
        return False
    node[leaf] = value.astype(have.dtype)
    return True


def _mha_paths(prefix, w, b, wo, bo, nheads):
    d = w.shape[1]
    hd = d // nheads
    wq, wk, wv = np.split(w, 3, axis=0)  # each [D, D]
    bq, bk, bv = np.split(b, 3, axis=0)
    out = {}
    for name, wm, bm in (("query", wq, bq), ("key", wk, bk), ("value", wv, bv)):
        out[prefix + (name, "kernel")] = wm.T.reshape(d, nheads, hd)
        out[prefix + (name, "bias")] = bm.reshape(nheads, hd)
    out[prefix + ("out", "kernel")] = wo.T.reshape(nheads, hd, d)
    out[prefix + ("out", "bias")] = bo
    return out


def import_state_dict(
    state_dict: dict,
    flax_params: dict,
    nheads: int = 8,
    strict: bool = False,
) -> dict:
    """Returns a new params dict with every mappable tensor replaced.

    state_dict: torch-style {name: tensor}; flax_params: the 'params'-keyed
    dict from model.init. Unmapped reference keys are reported via the
    returned dict's companion list when strict=False.
    """
    import copy

    tree = copy.deepcopy(
        flax_params["params"] if "params" in flax_params else flax_params
    )
    sd = {k: _to_np(v) for k, v in state_dict.items()}
    used = set()
    missed = []
    # deformable checkpoints: decoder-layer norm numbering differs from the
    # vanilla transformer (reference deformable_transformer.py:333-355:
    # norm2 follows self-attn, norm1 follows cross-attn, norm3 the ffn;
    # our flax modules create LayerNorms in call order)
    deformable = any("sampling_offsets" in k for k in sd)
    dec_norm_map = (
        {"1": "LayerNorm_1", "2": "LayerNorm_0", "3": "LayerNorm_2"}
        if deformable
        else None
    )
    if deformable:
        import warnings

        warnings.warn(
            "importing a deformable checkpoint: if it was TRAINED with the "
            "reference fork, set msda_ref_normalizer=True on the model — "
            "the fork divides sampling offsets by (H, W) "
            "(ms_deform_attn.py:79, swapped vs upstream Deformable-DETR); "
            "without the flag the imported offsets sample wrong locations.",
            stacklevel=2,
        )

    def take(k):
        used.add(k)
        return sd[k]

    def conv(k):
        return take(k).transpose(2, 3, 1, 0)

    def lin(k):
        return take(k).T

    writes = {}
    # Some reference tensors map to one of SEVERAL possible target layouts
    # (MHA block-wrapper vs bare self_attn; class_embed.0 -> class_embed0
    # AND the shared class_embed). Paths registered in an alternative
    # group are applied non-strictly even under strict=True; strict mode
    # then requires that at least one member of each group resolved
    # (advisor round-2: requiring every member made strict unusable).
    alt_groups: dict = {}

    def alt(group_key, paths):
        alt_groups.setdefault(group_key, []).extend(paths)

    for k in list(sd):
        # ---- backbone ----
        m = re.match(r"backbone\.0\.body\.(conv1|bn1)\.(\w+)$", k)
        if m:
            mod, leaf = m.groups()
            if mod == "conv1":
                writes[("backbone", "trunk", "conv1", "kernel")] = conv(k)
            else:
                writes[("backbone", "trunk", "bn1", leaf)] = take(k)
            continue
        m = re.match(
            r"backbone\.0\.body\.layer(\d)\.(\d+)\.(conv\d|bn\d)\.(\w+)$", k
        )
        if m:
            layer, block, mod, leaf = m.groups()
            scope = ("backbone", "trunk", f"layer{layer}_{block}")
            if mod.startswith("conv"):
                writes[scope + (mod, "kernel")] = conv(k)
            else:
                writes[scope + (mod, leaf)] = take(k)
            continue
        m = re.match(
            r"backbone\.0\.body\.layer(\d)\.(\d+)\.downsample\.(\d)\.(\w+)$", k
        )
        if m:
            layer, block, idx, leaf = m.groups()
            scope = ("backbone", "trunk", f"layer{layer}_{block}")
            if idx == "0":
                writes[scope + ("downsample_conv", "kernel")] = conv(k)
            else:
                writes[scope + ("downsample_bn", leaf)] = take(k)
            continue
        # ---- KineT dual-stream (reference detr.py:288-425) ----
        m = re.match(
            r"backbone_(det|metadata)\.0\.layers\.0\.(linear\d|norm)\.(weight|bias)$",
            k,
        )
        if m:
            stream, mod, leaf = m.groups()
            scope = (
                "kinet_backbone",
                "det_backbone" if stream == "det" else "meta_backbone",
                mod,
            )
            if mod == "norm":
                writes[scope + ("scale" if leaf == "weight" else "bias",)] = take(k)
            else:
                writes[scope + ("kernel" if leaf == "weight" else "bias",)] = (
                    lin(k) if leaf == "weight" else take(k)
                )
            continue
        if k == "query_embed_det.weight":
            writes[("query_embed_det",)] = take(k)
            continue
        if k == "query_embed_metadata.weight":
            writes[("query_embed_meta",)] = take(k)
            continue
        m = re.match(
            r"input_proj_tracklets_(det|metadata)\.layers\.(\d)\.(weight|bias)$",
            k,
        )
        if m:
            stream, i, leaf = m.groups()
            scope = (
                "track_proj_det" if stream == "det" else "track_proj_meta",
                f"layer{i}",
            )
            writes[scope + ("kernel" if leaf == "weight" else "bias",)] = (
                lin(k) if leaf == "weight" else take(k)
            )
            continue
        m = re.match(
            r"transformer\.(detection|metadata)_branch\."
            r"(linear_input1|linear_input2|norm)\.(weight|bias)$",
            k,
        )
        if m:
            branch, mod, leaf = m.groups()
            scope = ("transformer", f"{branch}_branch", mod)
            if mod == "norm":
                writes[scope + ("scale" if leaf == "weight" else "bias",)] = take(k)
            else:
                writes[scope + ("kernel" if leaf == "weight" else "bias",)] = (
                    lin(k) if leaf == "weight" else take(k)
                )
            continue
        # (the reference IntertwinedBranch also owns a `linear2` its forward
        # never applies — left unmapped on purpose)
        # ---- heads & embeds ----
        if k == "query_embed.weight":
            writes[("query_embed",)] = take(k)
            continue
        if k in ("input_proj.weight",):
            writes[("input_proj", "kernel")] = conv(k)
            continue
        if k in ("input_proj.bias",):
            writes[("input_proj", "bias")] = take(k)
            continue
        m = re.match(r"class_embed\.(weight|bias)$", k)
        if m:
            leaf = m.group(1)
            writes[("class_embed", "kernel" if leaf == "weight" else "bias")] = (
                lin(k) if leaf == "weight" else take(k)
            )
            continue
        m = re.match(r"bbox_embed\.layers\.(\d)\.(weight|bias)$", k)
        if m:
            i, leaf = m.groups()
            writes[
                ("bbox_embed", f"layer{i}", "kernel" if leaf == "weight" else "bias")
            ] = lin(k) if leaf == "weight" else take(k)
            continue
        # ---- segmentation heads (reference detr_segmentation.py) ----
        m = re.match(r"bbox_attention\.(q_linear|k_linear)\.(weight|bias)$", k)
        if m:
            mod, leaf = m.groups()
            writes[
                ("bbox_attention", mod,
                 "kernel" if leaf == "weight" else "bias")
            ] = lin(k) if leaf == "weight" else take(k)
            continue
        m = re.match(r"mask_head\.(lay\d|adapter\d|out_lay|gn\d)\.(weight|bias)$", k)
        if m:
            mod, leaf = m.groups()
            if mod.startswith("gn"):
                writes[
                    ("mask_head", mod, "scale" if leaf == "weight" else "bias")
                ] = take(k)
            else:
                writes[
                    ("mask_head", mod,
                     "kernel" if leaf == "weight" else "bias")
                ] = conv(k) if leaf == "weight" else take(k)
            continue
        # ---- deformable-DETR specifics ----
        m = re.match(r"input_proj\.(\d+)\.(0|1)\.(weight|bias)$", k)
        if m:
            i, sub, leaf = m.groups()
            if sub == "0":  # 1x1 (or 3x3 extra-level) conv
                writes[(f"input_proj{i}", "kernel" if leaf == "weight" else "bias")] = (
                    conv(k) if leaf == "weight" else take(k)
                )
            else:  # GroupNorm
                writes[
                    (f"input_proj_gn{i}",
                     "scale" if leaf == "weight" else "bias")
                ] = take(k)
            continue
        if k == "transformer.level_embed":
            writes[("transformer", "level_embed")] = take(k)
            continue
        # two-stage heads (reference deformable_transformer.py:52-56)
        m = re.match(
            r"transformer\.(enc_output|pos_trans)(_norm)?\.(weight|bias)$", k
        )
        if m:
            mod, is_norm, leaf = m.groups()
            name = mod + (is_norm or "")
            if is_norm:
                writes[
                    ("transformer", name,
                     "scale" if leaf == "weight" else "bias")
                ] = take(k)
            else:
                writes[
                    ("transformer", name,
                     "kernel" if leaf == "weight" else "bias")
                ] = lin(k) if leaf == "weight" else take(k)
            continue
        m = re.match(r"transformer\.reference_points\.(weight|bias)$", k)
        if m:
            leaf = m.group(1)
            writes[
                ("transformer", "reference_points_head",
                 "kernel" if leaf == "weight" else "bias")
            ] = lin(k) if leaf == "weight" else take(k)
            continue
        # per-decoder-layer heads (ModuleLists; with refine distinct, else
        # the reference repeats one shared instance — map index 0 to our
        # shared module as well, the non-strict writer picks what exists)
        m = re.match(r"class_embed\.(\d+)\.(weight|bias)$", k)
        if m:
            i, leaf = m.groups()
            val = lin(k) if leaf == "weight" else take(k)
            suffix = ("kernel" if leaf == "weight" else "bias",)
            writes[(f"class_embed{i}",) + suffix] = val
            if i == "0":
                writes[("class_embed",) + suffix] = val
                alt(("class_embed", i) + suffix,
                    [(f"class_embed{i}",) + suffix,
                     ("class_embed",) + suffix])
            continue
        m = re.match(r"bbox_embed\.(\d+)\.layers\.(\d)\.(weight|bias)$", k)
        if m:
            i, j, leaf = m.groups()
            val = lin(k) if leaf == "weight" else take(k)
            suffix = (f"layer{j}", "kernel" if leaf == "weight" else "bias")
            writes[(f"bbox_embed{i}",) + suffix] = val
            if i == "0":
                writes[("bbox_embed",) + suffix] = val
                alt(("bbox_embed", i) + suffix,
                    [(f"bbox_embed{i}",) + suffix,
                     ("bbox_embed",) + suffix])
            continue
        # ---- transformer layers (optionally nested in a KineT stream) ----
        m = re.match(
            r"transformer\.(?:(transformer_det|transformer_metadata)\.)?"
            r"(encoder|decoder)\.layers\.(\d+)\.(.+)$",
            k,
        )
        if m:
            stream, side, i, rest = m.groups()
            scope = ("transformer",) + ((stream,) if stream else ()) + (
                side, f"layer{i}",
            )
            pre = "transformer." + (f"{stream}." if stream else "")
            # MSDeformAttn sub-linears (deformable enc self_attn / dec
            # cross_attn; reference ops/modules/ms_deform_attn.py:28-33)
            m2 = re.match(
                r"(self_attn|cross_attn)\."
                r"(sampling_offsets|attention_weights|value_proj|output_proj)"
                r"\.(weight|bias)$",
                rest,
            )
            if m2:
                attn_name, mod, leaf = m2.groups()
                writes[
                    scope + (attn_name, mod,
                             "kernel" if leaf == "weight" else "bias")
                ] = lin(k) if leaf == "weight" else take(k)
                continue
            if rest.startswith("self_attn.") or rest.startswith(
                "multihead_attn."
            ):
                attn = (
                    ("_SelfAttnBlock_0", "MultiHeadDotProductAttention_0")
                    if rest.startswith("self_attn.")
                    else ("cross_attn", "MultiHeadDotProductAttention_0")
                )
                base = rest.split(".", 1)[0]
                if rest.endswith("in_proj_weight"):
                    mha_args = (
                        take(k),
                        sd[f"{pre}{side}.layers.{i}.{base}.in_proj_bias"],
                        sd[f"{pre}{side}.layers.{i}.{base}.out_proj.weight"],
                        sd[f"{pre}{side}.layers.{i}.{base}.out_proj.bias"],
                        nheads,
                    )
                    wrapped = _mha_paths(scope + attn, *mha_args)
                    writes.update(wrapped)
                    # deformable decoder names its MHA "self_attn" directly
                    # (no block wrapper); the non-strict writer skips
                    # whichever layout the target tree lacks — in strict
                    # mode the alt group requires one layout to resolve
                    bare = _mha_paths(scope + (base,), *mha_args)
                    writes.update(bare)
                    alt(scope + (base, "mha"),
                        list(wrapped) + list(bare))
                    used.update(
                        {
                            f"{pre}{side}.layers.{i}.{base}.in_proj_bias",
                            f"{pre}{side}.layers.{i}.{base}.out_proj.weight",
                            f"{pre}{side}.layers.{i}.{base}.out_proj.bias",
                        }
                    )
                continue
            m2 = re.match(r"linear(\d)\.(weight|bias)$", rest)
            if m2:
                n, leaf = m2.groups()
                writes[
                    scope
                    + (f"Dense_{int(n) - 1}", "kernel" if leaf == "weight" else "bias")
                ] = lin(k) if leaf == "weight" else take(k)
                continue
            m2 = re.match(r"norm(\d)\.(weight|bias)$", rest)
            if m2:
                n, leaf = m2.groups()
                if side == "decoder" and dec_norm_map is not None:
                    ln = dec_norm_map[n]
                else:
                    ln = f"LayerNorm_{int(n) - 1}"
                writes[
                    scope + (ln, "scale" if leaf == "weight" else "bias")
                ] = take(k)
                continue
        m = re.match(
            r"transformer\.(?:(transformer_det|transformer_metadata)\.)?"
            r"decoder\.norm\.(weight|bias)$",
            k,
        )
        if m:
            stream, leaf = m.groups()
            writes[
                ("transformer",) + ((stream,) if stream else ())
                + ("decoder", "norm", "scale" if leaf == "weight" else "bias")
            ] = take(k)
            continue
        m = re.match(
            r"transformer\.(?:(transformer_det|transformer_metadata)\.)?"
            r"encoder\.norm\.(weight|bias)$",
            k,
        )
        if m:
            stream, leaf = m.groups()
            writes[
                ("transformer",) + ((stream,) if stream else ())
                + ("encoder", "LayerNorm_0",
                   "scale" if leaf == "weight" else "bias")
            ] = take(k)
            continue

    if isinstance(tree.get("detector"), dict):
        # segmentation wrapper (models/segmentation.py): the DETR core
        # nests under 'detector' while bbox_attention/mask_head stay
        # top-level — mirror the reference's DETRSegm* mixins whose
        # state_dict stays flat (detr_segmentation.py:75-98)
        def _route(path):
            if path[0] in ("bbox_attention", "mask_head"):
                return path
            return ("detector",) + tuple(path)

        writes = {_route(p): v for p, v in writes.items()}
        alt_groups = {
            k: [_route(p) for p in paths] for k, paths in alt_groups.items()
        }

    applied = 0
    alt_paths = {p for paths in alt_groups.values() for p in paths}
    alt_applied: dict = {}
    for path, val in writes.items():
        in_alt = path in alt_paths
        if _set(tree, list(path), val, strict and not in_alt):
            applied += 1
            if in_alt:
                alt_applied[path] = True
    if strict:
        for key, paths in alt_groups.items():
            if not any(alt_applied.get(p) for p in paths):
                raise KeyError(
                    f"no alternative layout resolved for {'/'.join(map(str, key))}"
                )
    unused = [k for k in sd if k not in used]
    if strict and unused:
        raise KeyError(f"unmapped reference keys: {unused[:10]}...")
    return (
        {"params": tree} if "params" in flax_params else tree,
        {"applied": applied, "unmapped": unused},
    )
