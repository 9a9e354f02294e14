"""Extract dataset category tables from the reference into JSON data files.

The reference embeds ~1800 LoC of category metadata as python literals
(Detic/detic/data/datasets/{oid,objects365,coco_zeroshot,
lvis_22k_categories}.py). These are *data*, not code — this tool parses the
literal assignments with `ast` (never executing reference code) and writes
them as JSON under embodied_object_detection_tpu/data/metadata/, which
data/catalog.py loads at runtime.

Run once:  python tools/extract_category_metadata.py
"""

import ast
import json
import os
import shutil

REF = "/root/reference/Detic"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "embodied_object_detection_tpu", "data", "metadata")


def literal_assignment(path: str, name: str):
    """Pull `name = <literal>` out of a python file without executing it."""
    with open(path) as f:
        tree = ast.parse(f.read())
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name) and tgt.id == name:
                    return ast.literal_eval(node.value)
    raise KeyError(f"{name} not found in {path}")


def main():
    os.makedirs(OUT, exist_ok=True)
    ds = os.path.join(REF, "detic", "data", "datasets")

    oid = literal_assignment(os.path.join(ds, "oid.py"), "categories")
    with open(os.path.join(OUT, "oid_categories.json"), "w") as f:
        json.dump(oid, f)
    print(f"oid: {len(oid)}")

    o365 = literal_assignment(os.path.join(ds, "objects365.py"),
                              "categories_v2_fix")
    with open(os.path.join(OUT, "objects365_categories.json"), "w") as f:
        json.dump(o365, f)
    print(f"objects365: {len(o365)}")

    seen = literal_assignment(os.path.join(ds, "coco_zeroshot.py"),
                              "categories_seen")
    unseen = literal_assignment(os.path.join(ds, "coco_zeroshot.py"),
                                "categories_unseen")
    with open(os.path.join(OUT, "coco_zeroshot_categories.json"), "w") as f:
        json.dump({"seen": seen, "unseen": unseen}, f)
    print(f"coco_zeroshot: {len(seen)} seen / {len(unseen)} unseen")

    lvis22k = literal_assignment(os.path.join(ds, "lvis_22k_categories.py"),
                                 "CATEGORIES")
    slim = [{"id": c["id"], "name": c["name"]} for c in lvis22k]
    with open(os.path.join(OUT, "lvis_22k_categories.json"), "w") as f:
        json.dump(slim, f)
    print(f"lvis_22k: {len(slim)}")

    with open(os.path.join(REF, "datasets", "metadata",
                           "lvis_v1_train_cat_info.json")) as f:
        lvis = json.load(f)
    slim = [{k: c[k] for k in ("id", "name", "frequency", "image_count",
                               "synonyms")} for c in lvis]
    with open(os.path.join(OUT, "lvis_v1_categories.json"), "w") as f:
        json.dump(slim, f)
    print(f"lvis_v1: {len(slim)}")

    shutil.copy(os.path.join(REF, "datasets", "metadata",
                             "imagenet_lvis_wnid.txt"),
                os.path.join(OUT, "imagenet_lvis_wnid.txt"))
    print("copied imagenet_lvis_wnid.txt")


if __name__ == "__main__":
    main()
