"""Offline region-feature extraction entry point.

Reference: feature_extraction/coco_proposal.py (+ the other per-dataset
drivers) writing ``*_obj36.h5``. Here the whole per-image pipeline is
one jit-compiled TPU program (vision/frcnn.py); output is either the
reference h5 schema or the native pack.

    python -m vqacl_tpu.cli.extract_features \
        --images /path/to/val2014 --out datasets/COCO/features/val2014_obj36.h5 \
        --weights frcnn_vg.npz [--pack]
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Iterator, Tuple

import numpy as np


def iter_images(image_dir: str) -> Iterator[Tuple[str, np.ndarray]]:
    from PIL import Image
    for name in sorted(os.listdir(image_dir)):
        if not name.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        img_id = os.path.splitext(name)[0]
        rgb = np.asarray(Image.open(
            os.path.join(image_dir, name)).convert("RGB"))
        yield img_id, rgb[:, :, ::-1]  # BGR, caffe convention


def iter_dataset_images(items) -> Iterator[Tuple[str, np.ndarray, object]]:
    """(img_id, path, boxes|None) items → (img_id, BGR image, boxes)."""
    from PIL import Image
    for img_id, path, boxes in items:
        rgb = np.asarray(Image.open(path).convert("RGB"))
        yield img_id, rgb[:, :, ::-1], boxes


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--images", default=None,
                   help="plain image directory (the default driver)")
    p.add_argument("--dataset", default=None,
                   choices=["coco", "flickr30k", "vcr", "refcocog",
                            "refcocog_mattnet"],
                   help="dataset-specific enumeration (the reference's "
                        "per-dataset drivers: coco/flickr30k/vcr/refcocog/"
                        "refcocog_mattnet)")
    p.add_argument("--dataset_root", default=None)
    p.add_argument("--split", default=None)
    p.add_argument("--gt", action="store_true",
                   help="use the dataset's GT boxes (the *_gt.py drivers) "
                        "instead of RPN proposals")
    p.add_argument("--coco_images", default=None,
                   help="COCO image dir for refcocog (its images live in "
                        "COCO train2014)")
    p.add_argument("--out", required=True)
    p.add_argument("--weights", default=None,
                   help="npz of converted detector weights (random if unset)")
    p.add_argument("--n_boxes", type=int, default=36)
    p.add_argument("--pack", action="store_true",
                   help="write native .vfpack instead of h5")
    p.add_argument("--arrow", action="store_true",
                   help="write Apache Arrow (the reference's "
                        "inference/extracting_data.py schema)")
    p.add_argument("--boxes_json", default=None,
                   help="given-box mode ({img_id: [[x1,y1,x2,y2],...]}):"
                        " RoI features at the provided GT boxes instead of"
                        " RPN proposals (reference *_gt.py drivers)")
    args = p.parse_args(argv)

    import jax

    from vqacl_tpu.vision import frcnn
    from vqacl_tpu.vision.convert_weights import load_npz_params

    if args.weights:
        params = load_npz_params(args.weights)
    else:
        print("WARNING: no --weights given; using random detector weights")
        params = frcnn.init_frcnn(jax.random.PRNGKey(0))

    given_boxes = None
    if args.boxes_json:
        import json
        with open(args.boxes_json) as f:
            given_boxes = json.load(f)

    if args.dataset:
        from vqacl_tpu.vision.datasets import enumerate_dataset
        assert args.dataset_root, "--dataset needs --dataset_root"
        source = iter_dataset_images(enumerate_dataset(
            args.dataset, args.dataset_root, args.split, gt=args.gt,
            coco_images_dir=args.coco_images))
    else:
        assert args.images, "need --images or --dataset"

        def dir_source():
            for img_id, bgr in iter_images(args.images):
                if given_boxes is not None:
                    if img_id not in given_boxes:
                        continue
                    yield img_id, bgr, np.asarray(given_boxes[img_id],
                                                  np.float32)
                else:
                    yield img_id, bgr, None
        source = dir_source()

    def records():
        import jax.numpy as jnp
        for img_id, bgr, boxes in source:
            if boxes is not None:
                boxes = np.asarray(boxes, np.float32)
                pad = args.n_boxes - len(boxes)
                if pad > 0:
                    boxes = np.concatenate(
                        [boxes, np.tile(boxes[-1:], (pad, 1))], axis=0)
                boxes = boxes[:args.n_boxes]
                resized, scale = frcnn.resize_shortest_edge(
                    bgr.astype(np.float32))
                feats, obj_id, obj_conf = frcnn.extract_given_boxes(
                    params, jnp.asarray(frcnn.pad_to_bucket(resized)),
                    jnp.asarray(boxes * scale))
                rec = {"features": np.asarray(feats, np.float32),
                       "boxes": boxes,
                       "img_h": bgr.shape[0], "img_w": bgr.shape[1],
                       "obj_id": np.asarray(obj_id),
                       "obj_conf": np.asarray(obj_conf)}
            else:
                rec = frcnn.extract_image(params, bgr, n_boxes=args.n_boxes)
            yield img_id, rec

    if args.arrow:
        from vqacl_tpu.data.arrow_store import write_arrow
        write_arrow(args.out, records(), n_boxes=args.n_boxes)
    elif args.pack:
        from vqacl_tpu.data.packed_cache import write_pack
        write_pack(args.out,
                   ((i, r["features"], r["boxes"], r["img_h"], r["img_w"])
                    for i, r in records()),
                   n_boxes=args.n_boxes)
    else:
        from vqacl_tpu.data.features import write_h5
        write_h5(args.out, records())
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main(sys.argv[1:])
