"""Dataset-preparation utilities (Detic tools/ analogs).

Subcommands:

  cat-info   annotate a COCO/LVIS json's categories with image/instance
             counts (+ r/c/f frequency buckets) — the fed-loss frequency
             table (ref: Detic/tools/get_lvis_cat_info.py:1-44; consumed
             by models/losses.py fed_loss_class_weight's frequency
             weights)
  clip-features
             embed class names with the flax CLIP text tower into a
             zs_weight .npy (ref: Detic/tools/dump_clip_features.py:1-116
             — the reference embeds 'a <name>' prompts with CLIP-B/32 and
             saves [C, 512] fp32)

Usage:
  python tools/dataset_prep.py cat-info --ann lvis_train.json --add-freq
  python tools/dataset_prep.py clip-features --names names.json \
      --clip-params clip_text.msgpack --out zs_weight.npy
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cat_info(ann_path: str, add_freq: bool = False, r_thresh: int = 10,
             c_thresh: int = 100, out_path: str = None) -> list:
    data = json.load(open(ann_path))
    cats = data["categories"]
    image_count = {x["id"]: set() for x in cats}
    ann_count = {x["id"]: 0 for x in cats}
    for x in data["annotations"]:
        image_count[x["category_id"]].add(x["image_id"])
        ann_count[x["category_id"]] += 1
    for x in cats:
        x["image_count"] = len(image_count[x["id"]])
        x["instance_count"] = ann_count[x["id"]]
        if add_freq:
            freq = "f"
            if x["image_count"] < c_thresh:
                freq = "c"
            if x["image_count"] < r_thresh:
                freq = "r"
            x["frequency"] = freq
    out_path = out_path or ann_path[:-5] + "_cat_info.json"
    json.dump(cats, open(out_path, "w"))
    return cats


def clip_features(names, out_path: str, clip_weights: str = None,
                  bpe_path: str = None, prompt: str = "a {}",
                  encoder=None) -> np.ndarray:
    """Class names -> [C, 512] embeddings .npy via the flax CLIP text
    tower (dump_clip_features.py saves [C, D]; run.py's zs-weight loader
    transposes to [D, C+1] and appends the background column)."""
    if encoder is None:
        from embodied_object_detection_tpu.models.text_encoder import (
            load_default_text_encoder)
        encoder = load_default_text_encoder(clip_weights, bpe_path)
    emb = encoder([prompt.format(n) for n in names])
    np.save(out_path, np.asarray(emb, np.float32))
    return emb


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    ci = sub.add_parser("cat-info")
    ci.add_argument("--ann", required=True)
    ci.add_argument("--add-freq", action="store_true")
    ci.add_argument("--r-thresh", type=int, default=10)
    ci.add_argument("--c-thresh", type=int, default=100)
    ci.add_argument("--out", default=None)
    cf = sub.add_parser("clip-features")
    cf.add_argument("--names", required=True,
                    help="json list of class names")
    cf.add_argument("--clip-params", required=True)
    cf.add_argument("--out", required=True)
    cf.add_argument("--prompt", default="a {}")
    args = p.parse_args(argv)
    if args.cmd == "cat-info":
        cats = cat_info(args.ann, args.add_freq, args.r_thresh,
                        args.c_thresh, args.out)
        print(f"{len(cats)} categories annotated")
    else:
        names = json.load(open(args.names))
        emb = clip_features(names, args.out, clip_weights=args.clip_params,
                            prompt=args.prompt)
        print(f"saved {emb.shape} -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
