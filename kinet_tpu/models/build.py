"""Model assembly (reference: src/trackformer/models/__init__.py:16-171).

build_model(cfg) -> (model, criterion, postprocessors)

- num_classes per dataset: 91 coco, 250 coco_panoptic, 20 for every MOT-ish
  person dataset (the reference's intentional 20-class hack for 1-class MOT,
  models/__init__.py:17-29),
- weight_dict expands aux '_{i}' and '_enc' suffixes so the criterion's
  total_loss is an exact-key weighted sum (reference :127-146).
"""
from __future__ import annotations

from .criterion import SetCriterion
from .detr import DETR, KineT, KinematicDetectorEncoder, KinematicDetectorTransformer
from .postprocess import build_postprocessors


def num_classes_for(dataset: str) -> int:
    if dataset == "coco":
        return 91
    if dataset == "coco_panoptic":
        return 250
    # mot, mot_kine, crowdhuman, mot_crowdhuman, coco_person, ...
    return 20


def build_weight_dict(cfg) -> dict:
    wd = {
        "loss_ce": cfg.cls_loss_coef,
        "loss_bbox": cfg.bbox_loss_coef,
        "loss_giou": cfg.giou_loss_coef,
    }
    if cfg.masks:
        wd["loss_mask"] = cfg.mask_loss_coef
        wd["loss_dice"] = cfg.dice_loss_coef
    if cfg.aux_loss:
        aux = {}
        for i in range(cfg.dec_layers - 1):
            aux.update({f"{k}_{i}": v for k, v in wd.items()})
        aux.update({f"{k}_enc": v for k, v in wd.items()})
        wd.update(aux)
    return wd


def build_model(cfg):
    dataset = cfg.get("dataset", "coco")
    num_classes = num_classes_for(dataset)
    tracking = bool(cfg.get("tracking", False))
    num_track_slots = int(cfg.get("max_track_queries", 100)) if tracking else 0

    common = dict(
        num_classes=num_classes,
        hidden_dim=cfg.hidden_dim,
        num_queries=cfg.num_queries,
        nheads=cfg.nheads,
        enc_layers=cfg.enc_layers,
        dim_feedforward=cfg.dim_feedforward,
        dropout=cfg.dropout,
        activation=cfg.activation,
        pre_norm=cfg.pre_norm,
        focal_loss=cfg.focal_loss,
        num_track_slots=num_track_slots,
    )

    if cfg.get("kine", False):
        if cfg.get("use_encoder_only", False):
            model = KinematicDetectorEncoder(
                num_classes=num_classes,
                hidden_dim=cfg.hidden_dim,
                nheads=cfg.nheads,
                enc_layers=cfg.enc_layers,
                dim_feedforward=cfg.dim_feedforward,
                dropout=cfg.dropout,
                activation=cfg.activation,
                pre_norm=cfg.pre_norm,
                focal_loss=cfg.focal_loss,
                num_track_slots=num_track_slots or cfg.max_number_detection,
                max_detections=cfg.max_number_detection,
            )
        else:
            # kine without use_encoder_only ALWAYS builds the dual-stream
            # KinematicDetectorTransformer — the reference's build wires
            # DualKinematicTransformer for every non-encoder-only kine
            # config (models/__init__.py:72-107, transformer.py:503-525);
            # used_ordered_queries only selects the MATCHER
            # (matcher.py:685-712). The single-stream KineT class exists
            # for parity but is never reachable from configs, as in the
            # reference.
            trail_len = max(int(cfg.track_prev_frame_range), 1)
            meta_dim = 2 if cfg.use_class else 1
            # use_encoding_tracklets=False (the reference's default,
            # models/__init__.py:83-90): RAW 4-number trails per frame
            enc = (
                int(cfg.encoding_dim_tracklets)
                if cfg.get("use_encoding_tracklets", False)
                else 0
            )
            model = KinematicDetectorTransformer(
                **common,
                dec_layers=cfg.dec_layers,
                aux_loss=cfg.aux_loss,
                max_detections=cfg.max_number_detection,
                trail_enc_dim=trail_len * (4 * enc if enc else 4),
                meta_hist_dim=trail_len * meta_dim,
            )
    elif cfg.get("deformable", False):
        from .deformable_detr import DeformableDETR

        # accuracy-UNSAFE perf knobs (measured model-level loss, PLAN.md:
        # enc_msda_topk truncates the attention mixture — op-level 3.2x but
        # degrades predictions; enc_msda_int8 quantizes the value tables).
        # Refuse them unless the config opts in explicitly.
        lossy = [
            k
            for k in ("enc_msda_topk", "enc_msda_int8", "dec_msda_int8")
            if cfg.get(k, 0)
        ]
        if lossy and not cfg.get("allow_lossy", False):
            raise ValueError(
                f"{lossy} change model predictions (measured accuracy loss, "
                "see PLAN.md / ops/msda.py); set allow_lossy=true to enable "
                "them anyway"
            )
        if lossy:
            import warnings

            warnings.warn(
                f"accuracy-unsafe MSDA variants enabled: {lossy} "
                "(allow_lossy=true) — predictions will differ from the "
                "exact model",
                stacklevel=2,
            )

        model = DeformableDETR(
            **common,
            dec_layers=cfg.dec_layers,
            aux_loss=cfg.aux_loss,
            backbone_name=cfg.backbone,
            dilation=cfg.dilation,
            num_feature_levels=cfg.num_feature_levels,
            dec_n_points=cfg.dec_n_points,
            enc_n_points=cfg.enc_n_points,
            with_box_refine=cfg.with_box_refine,
            two_stage=cfg.two_stage,
            multi_frame_attention=cfg.multi_frame_attention,
            multi_frame_encoding=cfg.multi_frame_encoding,
            merge_frame_features=cfg.merge_frame_features,
            cache_prev_encoder=bool(cfg.get("cache_prev_encoder", False)),
            enc_msda_shared_locs=bool(cfg.get("enc_msda_shared_locs", False)),
            enc_msda_topk=int(cfg.get("enc_msda_topk", 0)),
            enc_msda_int8=bool(cfg.get("enc_msda_int8", False)),
            enc_lite=bool(cfg.get("enc_lite", False)),
            enc_lite_klevels=int(cfg.get("enc_lite_klevels", 0)),
            enc_lite_high_klevels=int(cfg.get("enc_lite_high_klevels", 0)),
            dec_gather_raw=bool(cfg.get("dec_gather_raw", False)),
            dec_klevels=int(cfg.get("dec_klevels", 0)),
            dec_msda_int8=bool(cfg.get("dec_msda_int8", False)),
            msda_ref_normalizer=bool(cfg.get("msda_ref_normalizer", False)),
            masks=cfg.masks,
            remat=bool(cfg.get("remat", False)),
        )
    else:
        model = DETR(
            **common,
            dec_layers=cfg.dec_layers,
            aux_loss=cfg.aux_loss,
            backbone_name=cfg.backbone,
            dilation=cfg.dilation,
            track_attention=cfg.track_attention,
            masks=cfg.masks,
        )

    if cfg.masks and not cfg.get("kine", False):
        from .segmentation import SegmWrapper

        model = SegmWrapper(
            detector=model, hidden_dim=cfg.hidden_dim, nheads=cfg.nheads
        )

    losses = ["labels", "boxes", "cardinality"]
    if cfg.masks:
        losses.append("masks")

    # matcher dispatch mirrors reference build_matcher (matcher.py:685-712):
    # ordered matchers only when used_ordered_queries; else Hungarian
    if cfg.get("kine", False) and cfg.get("used_ordered_queries", False):
        matcher_kind = (
            "ordered_encoder"
            if cfg.get("use_encoder_only", False)
            else "ordered_transformer"
        )
    else:
        matcher_kind = "hungarian"
    n_assign = 1
    if matcher_kind == "ordered_transformer":
        n_assign = max(int(cfg.num_queries) // int(cfg.max_number_detection), 1)
    criterion = SetCriterion(
        num_classes=num_classes,
        weight_dict=build_weight_dict(cfg),
        eos_coef=cfg.eos_coef,
        losses=losses,
        matcher_kind=matcher_kind,
        ordered_n_assign=n_assign,
        ordered_num_track_slots=num_track_slots,
        focal_loss=cfg.focal_loss,
        focal_alpha=cfg.focal_alpha,
        focal_gamma=cfg.focal_gamma,
        tracking=tracking,
        track_query_false_positive_eos_weight=cfg.track_query_false_positive_eos_weight,
        cost_class=cfg.set_cost_class,
        cost_bbox=cfg.set_cost_bbox,
        cost_giou=cfg.set_cost_giou,
    )
    postprocessors = build_postprocessors(cfg)
    return model, criterion, postprocessors
