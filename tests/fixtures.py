"""Synthetic tiny fixtures: LRMovieNet-style json+h5 and LETOR arrays."""

import json
import os

import numpy as np


def make_movienet(dirpath, n_items=6, seq=4, feat=16, max_tag_range=(3, 7),
                  n_imgs_range=(1, 5), seed=0, with_index=True):
    """Writes data.json + clean_feat.h5; returns (json_path, h5_path)."""
    import h5py

    assert max_tag_range[0] >= 3, (
        "items need >= 3 tags: the fixture guarantees all three "
        "relevance classes (reward_eval) and 2-tag pair sampling")
    rng = np.random.RandomState(seed)
    os.makedirs(dirpath, exist_ok=True)
    items = []
    h5_path = os.path.join(dirpath, "clean_feat.h5")
    with h5py.File(h5_path, "w") as hf:
        for i in range(n_items):
            iid = f"item{i}"
            t = rng.randint(*max_tag_range)
            tags = [{"tag": f"t{j}", "target": int(rng.randint(0, 3))}
                    for j in range(t)]
            # guarantee all three classes exist for reward_eval mode
            for c in range(3):
                tags[c % t]["target"] = c
            item = {"id": iid, "tags": tags}
            if with_index:
                item["index"] = [
                    sorted(rng.choice(t, 2, replace=False).tolist())
                    for _ in range(3)
                ]
            items.append(item)
            g = hf.create_group(iid)
            g.create_dataset("text_emb",
                             data=rng.randn(t, seq, feat).astype(np.float32))
            n_imgs = rng.randint(*n_imgs_range)
            g.create_dataset("img_emb",
                             data=rng.randn(1, n_imgs, feat).astype(np.float32))
    json_path = os.path.join(dirpath, "data.json")
    with open(json_path, "w") as f:
        json.dump(items, f)
    return json_path, h5_path


def make_letor_groups(n_queries=5, docs=20, n_feat=16, n_classes=3, seed=0):
    """{qid: (docs, 2+F)} grouped arrays like convert_to_h5py output."""
    rng = np.random.RandomState(seed)
    groups = {}
    for q in range(n_queries):
        labels = rng.randint(0, n_classes, size=(docs, 1)).astype(np.float32)
        # ensure at least 2 distinct classes per query
        labels[0, 0], labels[1, 0] = 0.0, float(n_classes - 1)
        qid = np.full((docs, 1), q, dtype=np.float32)
        feats = rng.randn(docs, n_feat).astype(np.float32)
        groups[q] = np.concatenate([labels, qid, feats], axis=1)
    return groups


def write_letor_h5(path, groups):
    """Write {qid: (docs, 2+F)} groups to a grouped .h5 file — the
    exact layout datasets_trad/convert_to_h5py.py:7-43 produces and
    both our LetorQueries.from_h5 and the reference LTRDataset read."""
    import h5py

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as hf:
        for qid, arr in groups.items():
            hf.create_dataset(str(qid), data=np.asarray(arr, np.float32))
    return path


def make_planted_letor_dirs(root, n_src=64, n_tgt=64, n_test=32,
                            docs=20, n_feat=768, seed=0,
                            rotate=0.8, label_noise=0.15):
    """Planted-structure LETOR transfer task for the full-run A/B
    (VERDICT r4 #1): doc relevance follows a hidden linear scorer, with
    a SOURCE domain (scorer w1, noisy labels) and a TARGET domain
    (scorer w2 = w1 rotated by `rotate`, clean labels), mirroring the
    reference's Web10K -> MQ2008 transfer (datasets_trad/README.md).

    Writes three dirs in the reference's {train,test}.h5 layout:
      src/    train.h5 = source queries            (stage-1 train)
      merged/ train.h5 = source + target queries,  (stage-2/3 train,
              test.h5  = held-out target queries    combine_*.sh: test
                                                    is target-only)
    Labels are per-query quantiles of the hidden score (top 25% -> 2,
    next 35% -> 1, rest 0), with `label_noise` of source labels
    resampled so stage 1 plateaus below target-ideal and stage 3 has
    headroom. Returns (src_dir, merged_dir).
    """
    rng = np.random.RandomState(seed)
    w1 = rng.randn(n_feat)
    w1 /= np.linalg.norm(w1)
    delta = rng.randn(n_feat)
    delta -= (delta @ w1) * w1
    delta /= np.linalg.norm(delta)
    w2 = w1 + rotate * delta
    w2 /= np.linalg.norm(w2)

    def make_queries(n, qid0, w, noise):
        groups = {}
        for q in range(n):
            feats = rng.randn(docs, n_feat).astype(np.float32)
            score = feats @ w
            order = np.argsort(np.argsort(-score))   # rank of each doc
            labels = np.where(order < docs // 4, 2.0,
                              np.where(order < docs // 4 + int(docs * .35),
                                       1.0, 0.0)).astype(np.float32)
            if noise:
                flip = rng.rand(docs) < noise
                labels[flip] = rng.randint(0, 3, flip.sum())
            groups[qid0 + q] = np.concatenate(
                [labels[:, None], np.full((docs, 1), qid0 + q,
                                          np.float32), feats], axis=1)
        return groups

    src_train = make_queries(n_src, 0, w1, label_noise)
    tgt_train = make_queries(n_tgt, 100000, w2, 0.0)
    tgt_test = make_queries(n_test, 200000, w2, 0.0)

    src = os.path.join(root, "src")
    merged = os.path.join(root, "merged")
    write_letor_h5(os.path.join(src, "train.h5"), src_train)
    write_letor_h5(os.path.join(src, "test.h5"), tgt_test)
    write_letor_h5(os.path.join(merged, "train.h5"),
                   {**src_train, **tgt_train})
    write_letor_h5(os.path.join(merged, "test.h5"), tgt_test)
    return src, merged


def make_svmlight(path, n_rows=30, n_feat=8, n_qids=3, seed=0):
    rng = np.random.RandomState(seed)
    with open(path, "w") as f:
        for _ in range(n_rows):
            qid = rng.randint(0, n_qids)
            label = rng.randint(0, 3)
            feats = " ".join(
                f"{j+1}:{rng.randn():.4f}" for j in range(n_feat))
            f.write(f"{label} qid:{qid} {feats}\n")
    return path


def flatten_tree(tree, prefix=""):
    """Flatten a nested dict of arrays to {path: np.ndarray} for
    param-tree comparisons across processes/meshes."""
    import numpy as np

    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, prefix + "/" + str(k)))
    else:
        out[prefix] = np.asarray(tree)
    return out
