"""Learned perception: open-vocabulary detection + segmentation mask_fn.

Re-implements the reference's GroundingDINO + SAM tier (reference:
``src/planning/perception.py:68-148`` — ``detect`` with box/text thresholds,
``segment`` with IoU deduplication) as a ``mask_fn`` for
``PerceptionModule``: ``GroundedSAMMask(prompts)(rgb) -> (H, W) bool``.

The torch models are heavyweight and not present in every deployment, so
the backends are LAZY and INJECTABLE:

- ``detector(rgb) -> (boxes (n, 4) xyxy, scores (n,), labels)`` — defaults
  to a ``transformers`` zero-shot detector (GroundingDINO family) loaded on
  first use;
- ``segmenter(rgb, boxes) -> (n, H, W) bool`` — defaults to a
  ``transformers`` SAM checkpoint loaded on first use; a geometric box-fill
  fallback keeps the tier functional without SAM weights.

The mask contract itself (thresholding, instance budget, IoU dedup, the
union keep-mask) is pure numpy and tested against recorded fixtures
(tests/test_perception.py) — the tier stays honest without shipping model
weights.

For purely sim-backed loops, ``color_spread_mask_fn`` segments the splat
renderer's hue-colored particles from the gray table without any model —
the closed loop exercises the exact non-``use_raw`` perception path the
learned tier uses.
"""

import numpy as np

DEFAULT_DETECTOR_MODEL = "IDEA-Research/grounding-dino-tiny"
DEFAULT_SAM_MODEL = "facebook/sam-vit-base"


def mask_iou(a, b):
    """IoU of two boolean masks (reference: perception.py:137-141 dedup)."""
    a = np.asarray(a, bool)
    b = np.asarray(b, bool)
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float(inter) / float(union) if union else 0.0


def dedup_masks(masks, scores, iou_thresh=0.9, max_n=None):
    """Drop lower-scoring masks that overlap a kept one above ``iou_thresh``
    (reference: perception.py:133-148), keeping at most ``max_n``."""
    order = np.argsort(-np.asarray(scores))
    kept = []
    for i in order:
        if any(mask_iou(masks[i], masks[j]) > iou_thresh for j in kept):
            continue
        kept.append(i)
        if max_n is not None and len(kept) >= max_n:
            break
    return kept


def boxes_to_masks(rgb, boxes):
    """Geometric fallback segmenter: filled boxes (n, H, W) bool."""
    H, W = np.asarray(rgb).shape[:2]
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    out = np.zeros((len(boxes), H, W), bool)
    for i, (x0, y0, x1, y1) in enumerate(boxes):
        out[i, int(max(y0, 0)) : int(min(y1, H)) + 1,
            int(max(x0, 0)) : int(min(x1, W)) + 1] = True
    return out


class GroundedSAMMask:
    """Open-vocab detect + segment keep-mask (the reference's real-robot
    perception entry, perception.py:68-148).

    Args:
      prompts: open-vocabulary text prompts (task_config obj_list).
      box_threshold/text_threshold: detector confidence gates
        (perception.py:86-88).
      iou_thresh: instance mask dedup threshold (perception.py:137).
      max_n: instance budget (task_config max_n).
      detector/segmenter: injectable backends (tests; ONNX runtimes).
    """

    def __init__(self, prompts, box_threshold=0.5, text_threshold=0.5,
                 iou_thresh=0.9, max_n=1, device="cpu",
                 detector=None, segmenter=None,
                 detector_model=DEFAULT_DETECTOR_MODEL,
                 sam_model=DEFAULT_SAM_MODEL):
        self.prompts = tuple(prompts)
        self.box_threshold = box_threshold
        self.text_threshold = text_threshold
        self.iou_thresh = iou_thresh
        self.max_n = max_n
        self.device = device
        self._detector = detector
        self._segmenter = segmenter
        self._detector_model = detector_model
        self._sam_model = sam_model

    # -- lazy backends -------------------------------------------------------
    def _load_detector(self):
        import torch  # noqa: F401  (defer heavy import to first use)
        from transformers import pipeline

        pipe = pipeline("zero-shot-object-detection",
                        model=self._detector_model, device=self.device)
        labels = [p if p.endswith(".") else p + "." for p in self.prompts]

        def detect(rgb):
            from PIL import Image

            res = pipe(Image.fromarray(np.asarray(rgb, np.uint8)),
                       candidate_labels=list(labels),
                       threshold=self.box_threshold)
            boxes = np.asarray([[r["box"]["xmin"], r["box"]["ymin"],
                                 r["box"]["xmax"], r["box"]["ymax"]]
                                for r in res], np.float32).reshape(-1, 4)
            scores = np.asarray([r["score"] for r in res], np.float32)
            lab = [r["label"] for r in res]
            return boxes, scores, lab

        return detect

    def _load_segmenter(self):
        import torch
        from transformers import SamModel, SamProcessor

        model = SamModel.from_pretrained(self._sam_model).to(self.device)
        processor = SamProcessor.from_pretrained(self._sam_model)

        def segment(rgb, boxes):
            if not len(boxes):
                return np.zeros((0,) + np.asarray(rgb).shape[:2], bool)
            inputs = processor(np.asarray(rgb, np.uint8),
                               input_boxes=[[list(map(float, b)) for b in boxes]],
                               return_tensors="pt").to(self.device)
            with torch.no_grad():
                out = model(**inputs)
            masks = processor.image_processor.post_process_masks(
                out.pred_masks.cpu(), inputs["original_sizes"].cpu(),
                inputs["reshaped_input_sizes"].cpu())[0]
            # best proposal per box
            return np.asarray(masks[:, 0].numpy(), bool)

        return segment

    # -- reference API -------------------------------------------------------
    def detect(self, rgb):
        """(boxes (n, 4) xyxy, scores, labels) above the thresholds
        (reference: perception.py:68-107)."""
        if self._detector is None:
            self._detector = self._load_detector()
        boxes, scores, labels = self._detector(rgb)
        # the reference gates twice: box logits vs box_threshold and label
        # token scores vs text_threshold (perception.py:86-107). The
        # transformers zero-shot pipeline yields one per-(box, label) score,
        # so both thresholds apply to it — the effective gate is their max.
        keep = (np.asarray(scores, np.float32)
                >= max(self.box_threshold, self.text_threshold))
        return (np.asarray(boxes, np.float32).reshape(-1, 4)[keep],
                np.asarray(scores, np.float32)[keep],
                [l for l, k in zip(labels, keep) if k])

    def segment(self, rgb):
        """Instance masks with IoU dedup (reference: perception.py:110-148).
        Returns (masks (m, H, W) bool, scores (m,))."""
        boxes, scores, _ = self.detect(rgb)
        if self._segmenter is None:
            try:
                self._segmenter = self._load_segmenter()
            except Exception:
                # SAM weights unavailable: box-fill fallback keeps the tier
                # functional (documented contract, not silent)
                self._segmenter = boxes_to_masks
        masks = self._segmenter(rgb, boxes)
        if not len(masks):
            return np.zeros((0,) + np.asarray(rgb).shape[:2], bool), scores
        kept = dedup_masks(masks, scores, self.iou_thresh, self.max_n)
        return np.asarray(masks)[kept], np.asarray(scores)[kept]

    def __call__(self, rgb):
        """PerceptionModule mask_fn contract: union keep-mask (H, W) bool."""
        masks, _ = self.segment(rgb)
        if not len(masks):
            return np.ones(np.asarray(rgb).shape[:2], bool)  # keep all
        return np.any(masks, axis=0)


def color_spread_mask_fn(spread=20.0, max_value=255):
    """Sim-backed mask_fn: keep pixels whose RGB channel spread exceeds
    ``spread`` — the splat renderer paints particles with saturated
    per-instance hues over a gray table (sim/env.py MATERIAL_BASE_RGB), so
    channel spread separates object from background exactly. This drives the
    same non-``use_raw`` perception path as the learned tier, hardware-free."""

    def mask_fn(rgb):
        rgb = np.asarray(rgb, np.float32)
        return (rgb.max(axis=-1) - rgb.min(axis=-1)) > spread

    return mask_fn


def make_mask_fn(obj_prompts, max_n=1, box_threshold=0.5):
    """mask_fn factory for the CLI: a GroundedSAMMask when the torch tier is
    importable, else None (perception falls back to use_raw depth masking)."""
    if not obj_prompts:
        return None
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except ImportError:
        return None
    return GroundedSAMMask(obj_prompts, max_n=max_n, box_threshold=box_threshold)
