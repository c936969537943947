"""Per-dataset extraction enumerators (reference feature_extraction/*)."""

import json
import os
import pickle

import numpy as np
import pytest

from vqacl_tpu.vision.datasets import (enumerate_dataset, iter_coco,
                                       iter_flickr30k, iter_refcocog,
                                       iter_vcr)


def _touch_img(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    from PIL import Image
    Image.new("RGB", (8, 6)).save(path)


def test_coco_proposal_and_gt(tmp_path):
    root = str(tmp_path)
    for i in (7, 3):
        _touch_img(f"{root}/images/val2014/COCO_val2014_{i:012d}.jpg")
    items = list(iter_coco(root, "valid"))
    assert [i[0] for i in items] == ["COCO_val2014_000000000003",
                                     "COCO_val2014_000000000007"]
    assert all(b is None for _, _, b in items)

    inst = {"annotations": [
        {"image_id": 3, "bbox": [1, 2, 10, 20]},
        {"image_id": 3, "bbox": [0, 0, 4, 4]},
        {"image_id": 7, "bbox": [5, 5, 1, 1]},
    ]}
    os.makedirs(f"{root}/annotations")
    with open(f"{root}/annotations/instances_val2014.json", "w") as f:
        json.dump(inst, f)
    items = list(iter_coco(root, "valid", gt=True))
    assert items[0][0] == "COCO_val2014_000000000003"
    np.testing.assert_allclose(items[0][2],
                               [[1, 2, 11, 22], [0, 0, 4, 4]])  # xywh→xyxy
    np.testing.assert_allclose(items[1][2], [[5, 5, 6, 6]])


def test_vcr_dedup_and_gt_boxes(tmp_path):
    root = str(tmp_path)
    imgdir = f"{root}/vcr1images"
    _touch_img(f"{imgdir}/movie/0001.jpg")
    meta = {"boxes": [[1, 2, 3, 4, 0.9], [5, 6, 7, 8, 0.8]],
            "names": ["person", "car"]}
    os.makedirs(f"{imgdir}/movie", exist_ok=True)
    with open(f"{imgdir}/movie/0001.json", "w") as f:
        json.dump(meta, f)
    rows = [
        {"img_id": "m-1", "img_fn": "movie/0001.jpg",
         "metadata_fn": "movie/0001.json"},
        {"img_id": "m-1", "img_fn": "movie/0001.jpg",   # duplicate QA row
         "metadata_fn": "movie/0001.json"},
    ]
    with open(f"{root}/val.jsonl", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))

    items = list(iter_vcr(root, "val"))
    assert len(items) == 1 and items[0][0] == "m-1"       # deduped
    items = list(iter_vcr(root, "val", gt=True))
    np.testing.assert_allclose(items[0][2], [[1, 2, 3, 4], [5, 6, 7, 8]])


def test_refcocog_refs_and_filename_strip(tmp_path):
    root = str(tmp_path)
    ddir = f"{root}/refcocog"
    os.makedirs(ddir)
    refs = [
        {"image_id": 419645, "split": "val",
         "file_name": "COCO_train2014_000000419645_398406.jpg"},
        {"image_id": 419645, "split": "val",           # same image again
         "file_name": "COCO_train2014_000000419645_398407.jpg"},
        {"image_id": 5, "split": "train",
         "file_name": "COCO_train2014_000000000005_1.jpg"},
    ]
    with open(f"{ddir}/refs(umd).p", "wb") as f:
        pickle.dump(refs, f)
    with open(f"{ddir}/instances.json", "w") as f:
        json.dump({"annotations": [
            {"image_id": 419645, "bbox": [10, 10, 5, 5]}]}, f)

    items = list(iter_refcocog(root, "/coco/train2014", "val"))
    assert len(items) == 1
    img_id, path, boxes = items[0]
    assert img_id == "419645"
    # annotation suffix stripped (refcocog_gt.py:49-55)
    assert path == "/coco/train2014/COCO_train2014_000000419645.jpg"
    np.testing.assert_allclose(boxes, [[10, 10, 15, 15]])

    # proposal mode must refuse (the reference only ships given-box
    # refcocog drivers) instead of silently running GT extraction
    with pytest.raises(ValueError):
        enumerate_dataset("refcocog", root, "val", gt=False,
                          coco_images_dir="/coco/train2014")


def test_refcocog_mattnet_detections(tmp_path):
    from vqacl_tpu.vision.datasets import iter_refcocog_mattnet

    root = str(tmp_path)
    ddir = f"{root}/refcocog"
    os.makedirs(ddir)
    refs = [
        {"image_id": 419645, "split": "val",
         "file_name": "COCO_train2014_000000419645_398406.jpg"},
        {"image_id": 8, "split": "val",          # image with no detections
         "file_name": "COCO_train2014_000000000008_12.jpg"},
    ]
    with open(f"{ddir}/refs(umd).p", "wb") as f:
        pickle.dump(refs, f)
    dets_dir = f"{root}/detections/refcocog_umd"
    os.makedirs(dets_dir)
    dets = [   # MAttNet detections: flat list, xywh boxes
        {"image_id": 419645, "box": [10, 20, 30, 40], "category_name": "dog"},
        {"image_id": 419645, "box": [0, 0, 5, 5], "category_name": "cat"},
        {"image_id": 999, "box": [1, 1, 2, 2], "category_name": "car"},
    ]
    with open(f"{dets_dir}/res101_coco_minus_refer_notime_dets.json",
              "w") as f:
        json.dump(dets, f)

    items = list(iter_refcocog_mattnet(root, "/coco/train2014", "val"))
    assert len(items) == 1          # image 8 dropped (no detections)
    img_id, path, boxes = items[0]
    assert img_id == "419645"
    assert path == "/coco/train2014/COCO_train2014_000000419645.jpg"
    np.testing.assert_allclose(boxes, [[10, 20, 40, 60], [0, 0, 5, 5]])

    items2 = list(enumerate_dataset("refcocog_mattnet", root, "val",
                                    coco_images_dir="/coco/train2014"))
    assert [i[0] for i in items2] == ["419645"]


def test_flickr_and_front_door(tmp_path):
    root = str(tmp_path)
    _touch_img(f"{root}/flickr30k_images/flickr30k_images/42.jpg")
    items = list(iter_flickr30k(root))
    assert items[0][0] == "42"
    items2 = list(enumerate_dataset("flickr30k", root, None))
    assert items2 == items
    with pytest.raises(ValueError):
        list(enumerate_dataset("nope", root, None))
