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


def merge_coco_into_lvis(coco_data: dict, lvis_data: dict,
                         synset_table=None, iou_thresh: float = 0.7) -> dict:
    """Merge COCO annotations into an LVIS json
    (Detic/tools/merge_lvis_coco.py:112-202).

    COCO categories map to LVIS ids through the synset table; annotations
    whose category is in the image's neg_category_ids are dropped, and a
    COCO box overlapping a same-image SAME-CATEGORY LVIS box at IoU >=
    iou_thresh is a duplicate and skipped (cross-category overlaps are
    kept, merge_lvis_coco.py:185-195). Returns the merged LVIS-format dict.
    """
    # shared pairwise IoU on raw COCO xywh bboxes (same math the evaluator
    # uses, with the native fast path)
    from embodied_object_detection_tpu.evaluation.coco_eval import _iou_xywh
    if synset_table is None:
        meta = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "embodied_object_detection_tpu", "data",
                            "metadata", "coco_synset_categories.json")
        synset_table = json.load(open(meta))
    synset2lvisid = {x["synset"]: x["id"] for x in lvis_data["categories"]}
    coco2lvis = {x["coco_cat_id"]: synset2lvisid[x["synset"]]
                 for x in synset_table if x["synset"] in synset2lvisid}

    def tail(name):  # match images by trailing filename (merge_lvis_coco:129)
        return name[-16:]

    file_key = "file_name" if any(
        "file_name" in x for x in lvis_data["images"][:1]) else "coco_url"
    lvis_file2img = {tail(x[file_key]): x for x in lvis_data["images"]}
    coco_id2img = {x["id"]: x for x in coco_data["images"]}

    from collections import defaultdict
    coco_img2anns = defaultdict(list)
    for ann in coco_data["annotations"]:
        fn = tail(coco_id2img[ann["image_id"]]["file_name"])
        if ann["category_id"] not in coco2lvis or fn not in lvis_file2img:
            continue
        lvis_img = lvis_file2img[fn]
        lvis_cat = coco2lvis[ann["category_id"]]
        if lvis_cat in lvis_img.get("neg_category_ids", []):
            continue
        ann = dict(ann, category_id=lvis_cat, image_id=lvis_img["id"])
        coco_img2anns[fn].append(ann)

    lvis_id2img = {x["id"]: x for x in lvis_data["images"]}
    lvis_img2anns = defaultdict(list)
    for ann in lvis_data["annotations"]:
        fn = tail(lvis_id2img[ann["image_id"]][file_key])
        lvis_img2anns[fn].append(ann)

    merged, ann_id = [], 0
    # union: LVIS images with zero positive annotations (federated split)
    # can still receive mapped COCO annotations
    all_files = sorted(set(lvis_img2anns) | set(coco_img2anns))
    for fn in all_files:
        lvis_anns = lvis_img2anns.get(fn, [])
        keep = list(lvis_anns)
        coco_anns = coco_img2anns.get(fn, [])
        if coco_anns:
            ious = _iou_xywh(
                np.array([a["bbox"] for a in coco_anns], np.float64),
                np.array([a["bbox"] for a in lvis_anns], np.float64)
                if lvis_anns else np.zeros((0, 4)))
            for i, ann in enumerate(coco_anns):
                if len(lvis_anns) == 0 or ious[i].max() < iou_thresh:
                    keep.append(ann)
                else:
                    # only a SAME-category overlap is a duplicate
                    # (merge_lvis_coco.py:185-195): a COCO 'person' box
                    # over an LVIS 'chair' box is kept
                    dup = any(
                        ious[i, j] >= iou_thresh and
                        ann["category_id"] == lvis_anns[j]["category_id"]
                        for j in range(len(lvis_anns)))
                    if not dup:
                        keep.append(ann)
        for ann in keep:
            ann_id += 1
            merged.append(dict(ann, id=ann_id))
    out = dict(lvis_data)
    out["annotations"] = merged
    return out


def imagenet_tar_json(tar_dir: str, out_path: str,
                      categories=None) -> dict:
    """Dataset-records json for the tar ImageNet pipeline
    (Detic/tools/get_imagenet_21k_full_tar_json.py): one image record per
    tar member with its tarfile index as the label, consumable by
    data/tar_dataset.DiskTarDataset + the weak-supervision mapper."""
    from embodied_object_detection_tpu.data.tar_dataset import (
        build_tar_index)
    import glob as _glob
    tars = sorted(_glob.glob(os.path.join(tar_dir, "*.tar")))
    images, cats = [], []
    image_id = 0
    for ti, tar in enumerate(tars):
        names_npy, _ = build_tar_index(tar, tar_dir)
        names = np.load(names_npy)
        wnid = os.path.splitext(os.path.basename(tar))[0]
        cats.append({"id": ti, "name": wnid})
        for member in names:
            images.append({"id": image_id,
                           "file_name": str(member),
                           "tar_index": ti,
                           "pos_category_ids": [ti]})
            image_id += 1
    out = {"images": images,
           "categories": categories or cats,
           "annotations": []}
    json.dump(out, open(out_path, "w"))
    return out


def map_tag_name(x: str) -> str:
    """Synonym -> caption-matchable surface form (get_cc_tags.py:92-97):
    underscores to spaces, parentheticals stripped, lowercased."""
    x = x.replace("_", " ")
    if "(" in x:
        x = x[: x.find("(")]
    return x.lower().strip()


def cc_tags(cc_data: dict, categories=None, allcaps: bool = False,
            keep_images: bool = False) -> dict:
    """Mine caption text for category tags -> the cc3m `_tags` json.

    ref: Detic/tools/get_cc_tags.py:99-195 — per category, every synonym
    (space-padded) is substring-matched against the lowercased caption
    (plus the startswith/endswith edge forms); images gain
    `pos_category_ids` and tag-less images are dropped unless
    keep_images. `categories` defaults to the json's own (or the vendored
    LVIS v1 table). Categories WITHOUT a 'synonyms' field (COCO-style
    tables) are expanded coco_cat_id -> synset -> LVIS synonyms exactly as
    get_cc_tags.py:126-133 does — matching only the literal name would
    find far fewer tags (e.g. 'tv' never matches 'television')."""
    import copy
    meta_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "embodied_object_detection_tpu", "data",
                            "metadata")
    cc_data = copy.deepcopy(cc_data)
    if categories is not None:
        cc_data["categories"] = copy.deepcopy(categories)
    if "categories" not in cc_data:
        cc_data["categories"] = json.load(
            open(os.path.join(meta_dir, "lvis_v1_categories.json")))
    cats = cc_data["categories"]
    if cats and "synonyms" not in cats[0]:
        cocoid2synset = {x["coco_cat_id"]: x["synset"] for x in json.load(
            open(os.path.join(meta_dir, "coco_synset_categories.json")))}
        synset2synonyms = {x["synset"]: x["synonyms"] for x in json.load(
            open(os.path.join(meta_dir, "lvis_v1_train_cat_info.json")))}
        for c in cats:
            c["synonyms"] = synset2synonyms[cocoid2synset[c["id"]]]
            c["frequency"] = "f"
    for c in cats:
        c.setdefault("synonyms", [c["name"]])
    class_data = {c["id"]: [" " + map_tag_name(s) + " "
                            for s in c["synonyms"]] for c in cats}
    images = []
    for x in cc_data["images"]:
        caption = (" ".join(x["captions"]) if allcaps
                   else x["captions"][0]).lower()
        x["pos_category_ids"] = []
        for cat_id, names in class_data.items():
            for c in names:
                if c in caption or caption.startswith(c[1:]) \
                        or caption.endswith(c[:-1]):
                    x["pos_category_ids"].append(cat_id)
                    break
        if x["pos_category_ids"] or keep_images:
            images.append(x)
    return {"images": images, "categories": cats, "annotations": []}


def remove_rare(lvis_data: dict, exclude=("r",)) -> dict:
    """Drop annotations of rare-frequency categories (the `_norare` split;
    ref: Detic/tools/remove_lvis_rare.py)."""
    catid2freq = {c["id"]: c.get("frequency", "f")
                  for c in lvis_data["categories"]}
    out = dict(lvis_data)
    out["annotations"] = [a for a in lvis_data["annotations"]
                          if catid2freq[a["category_id"]] not in exclude]
    return out


def coco_zeroshot_oriorder(data: dict, full_categories) -> dict:
    """Replace a zeroshot split's category list with the full original-
    order table (ref: Detic/tools/get_coco_zeroshot_oriorder.py)."""
    out = dict(data)
    out["categories"] = full_categories
    return out


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
    mg = sub.add_parser("merge-lvis-coco")
    mg.add_argument("--coco", required=True)
    mg.add_argument("--lvis", required=True)
    mg.add_argument("--out", required=True)
    mg.add_argument("--iou-thresh", type=float, default=0.7)
    tj = sub.add_parser("imagenet-tar-json")
    tj.add_argument("--tar-dir", required=True)
    tj.add_argument("--out", required=True)
    ct = sub.add_parser("cc-tags")
    ct.add_argument("--cc-ann", required=True)
    ct.add_argument("--out", required=True)
    ct.add_argument("--cat-path", default="")
    ct.add_argument("--allcaps", action="store_true")
    ct.add_argument("--keep-images", action="store_true")
    nr = sub.add_parser("remove-rare")
    nr.add_argument("--ann", required=True)
    oo = sub.add_parser("coco-zeroshot-oriorder")
    oo.add_argument("--data-path", required=True)
    oo.add_argument("--cat-path", required=True)
    args = p.parse_args(argv)
    if args.cmd == "cat-info":
        cats = cat_info(args.ann, args.add_freq, args.r_thresh,
                        args.c_thresh, args.out)
        print(f"{len(cats)} categories annotated")
    elif args.cmd == "merge-lvis-coco":
        merged = merge_coco_into_lvis(json.load(open(args.coco)),
                                      json.load(open(args.lvis)),
                                      iou_thresh=args.iou_thresh)
        json.dump(merged, open(args.out, "w"))
        print(f"{len(merged['annotations'])} annotations -> {args.out}")
    elif args.cmd == "imagenet-tar-json":
        out = imagenet_tar_json(args.tar_dir, args.out)
        print(f"{len(out['images'])} images -> {args.out}")
    elif args.cmd == "cc-tags":
        cats = (json.load(open(args.cat_path))["categories"]
                if args.cat_path else None)
        out = cc_tags(json.load(open(args.cc_ann)), cats,
                      allcaps=args.allcaps, keep_images=args.keep_images)
        json.dump(out, open(args.out, "w"))
        print(f"{len(out['images'])} tagged images -> {args.out}")
    elif args.cmd == "remove-rare":
        out = remove_rare(json.load(open(args.ann)))
        out_path = args.ann[:-5] + "_norare.json"
        json.dump(out, open(out_path, "w"))
        print(f"{len(out['annotations'])} annotations -> {out_path}")
    elif args.cmd == "coco-zeroshot-oriorder":
        cat = json.load(open(args.cat_path))["categories"]
        out = coco_zeroshot_oriorder(json.load(open(args.data_path)), cat)
        out_path = args.data_path[:-5] + "_oriorder.json"
        json.dump(out, open(out_path, "w"))
        print(f"saved -> {out_path}")
    else:
        names = json.load(open(args.names))
        emb = clip_features(names, args.out, clip_weights=args.clip_params,
                            prompt=args.prompt)
        print(f"saved {emb.shape} -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
