"""Validate + arrange a real dataset tree and emit a ready-to-run config.

The reference points users at the MoCoDAD repo's dataset downloads for
HR-Avenue / HR-ShanghaiTech / UBnormal (/root/reference/README.md:36-38) and
then expects three YAML paths to be edited by hand (data_dir, test_path,
dataset_path_to_robust — /root/reference/README.md:50). This script is that
on-ramp, made executable: point it at the downloaded tree and it

  1. validates the layout the CLIs consume
       <root>/pose/training/*.json            AlphaPose tracked persons
       <root>/pose/testing/*.json
       <root>/pose/validating/*.json          (UBnormal only)
       <root>/testing/test_frame_mask/*.npy   per-clip GT masks (= test_path)
       <root>/validating/test_frame_mask/     (UBnormal in-training val GT)
       <root>/hr_bool_masks/testing/test_frame_mask/   (HR-UBnormal masks)
       Morais-format CSVs under --robust-root (robust pipeline, optional)
  2. arranges common alternative layouts: if poses live at <root>/training
     instead of <root>/pose/training (the flat MoCoDAD export), it creates
     the pose/ indirection as symlinks (--arrange; dry-run by default),
  3. deep-checks a sample of files: filenames parse as <scene>_<clip>,
     person->frame->keypoints JSON structure with len(keypoints) % 3 == 0
     and a consistent joint count, GT masks are 1-D integer arrays covering
     every pose frame index,
  4. writes a run config from a template with the paths filled in
     (--out-config). --smoke additionally sets `debug: true`, the
     reference's 5-clip/10-epoch smoke protocol (utils/dataset.py:27-29,
     utils/argparser.py:11-12), so the first contact with real data is a
     minutes-long sanity run, not a full training.

One documented command from raw dataset to trained checkpoint + eval AUC:

    python scripts/prepare_data.py --root /data/UBnormal --dataset UBnormal \
        --template config/UBnormal/euclidean_encoder.yaml \
        --out-config /tmp/ubnormal.yaml --smoke
    python -m coskad_tpu.cli.train --config /tmp/ubnormal.yaml
    python -m coskad_tpu.cli.eval  --config /tmp/ubnormal.yaml

(Smoke-tested against the synthetic fixture tree by
tests/test_prepare_data.py; drop --smoke for the paper-parity run.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import yaml

POSE_SPLITS = {
    "UBnormal": ("training", "testing", "validating"),
    "HR-UBnormal": ("training", "testing", "validating"),
    "HR-Avenue": ("training", "testing"),
    "HR-STC": ("training", "testing"),
    "Avenue": ("training", "testing"),
    "STC": ("training", "testing"),
}


class Problem(Exception):
    pass


def _say(msg: str) -> None:
    print(f"[prepare_data] {msg}")


def arrange_pose_dir(root: str, splits, apply: bool) -> None:
    """Create <root>/pose/<split> symlinks when poses live at <root>/<split>
    (the flat export layout some MoCoDAD mirrors use)."""
    pose_root = os.path.join(root, "pose")
    for split in splits:
        want = os.path.join(pose_root, split)
        if os.path.isdir(want):
            continue
        flat = os.path.join(root, split)
        has_jsons = os.path.isdir(flat) and any(
            f.endswith(".json") for f in os.listdir(flat)
        )
        if not has_jsons:
            continue
        if apply:
            os.makedirs(pose_root, exist_ok=True)
            os.symlink(os.path.abspath(flat), want)
            _say(f"arranged: {want} -> {flat}")
        else:
            _say(
                f"would arrange: {want} -> {flat} (re-run with --arrange)"
            )


def check_pose_split(d: str, sample: int = 3) -> tuple[int, int]:
    """Validate a pose-JSON directory; returns (n_clips, n_joints)."""
    if not os.path.isdir(d):
        raise Problem(f"missing pose directory: {d}")
    jsons = sorted(f for f in os.listdir(d) if f.endswith(".json"))
    if not jsons:
        raise Problem(f"no .json clips in {d}")
    # Filenames are cheap to validate: check every one (the loaders parse
    # scene/clip ids from them, data/alphapose.py:76-78). JSON contents are
    # deep-checked on a sample only.
    for fn in jsons:
        parts = fn.split("_")
        try:
            int(parts[0]), int(parts[1].split(".")[0])
        except (IndexError, ValueError):
            raise Problem(
                f"{fn}: filename must start '<scene>_<clip>' (the loaders "
                "parse scene/clip ids from it, data/alphapose.py:76-78)"
            )
    joints = set()
    for fn in jsons[:sample]:
        with open(os.path.join(d, fn)) as f:
            clip = json.load(f)
        if not isinstance(clip, dict):
            raise Problem(f"{fn}: top level must be a dict of person ids")
        for pid, frames in list(clip.items())[:4]:
            if not isinstance(frames, dict):
                raise Problem(f"{fn}: person {pid} must map frame->record")
            for fid, rec in list(frames.items())[:4]:
                kp = rec.get("keypoints")
                if not isinstance(kp, list) or len(kp) % 3:
                    raise Problem(
                        f"{fn}: person {pid} frame {fid}: 'keypoints' must "
                        "be a flat [x, y, score] * V list"
                    )
                joints.add(len(kp) // 3)
    if len(joints) > 1:
        raise Problem(f"{d}: inconsistent joint counts {sorted(joints)}")
    return len(jsons), (joints.pop() if joints else 0)


def check_gt_dir(d: str, pose_dir: str | None = None) -> int:
    if not os.path.isdir(d):
        raise Problem(f"missing ground-truth directory: {d}")
    npys = sorted(f for f in os.listdir(d) if f.endswith(".npy"))
    if not npys:
        raise Problem(f"no .npy masks in {d}")
    for fn in npys[:3]:
        arr = np.load(os.path.join(d, fn))
        if arr.ndim != 1:
            raise Problem(f"{fn}: GT mask must be 1-D, got shape {arr.shape}")
        u = np.unique(arr)
        if not np.isin(u, (0, 1)).all():
            raise Problem(f"{fn}: GT mask values must be 0/1, got {u[:8]}")
        try:
            scene = int(fn.split("_")[0])
            clip = int(fn.split("_")[1].split(".")[0])
        except (IndexError, ValueError):
            raise Problem(f"{fn}: GT filename must be '<scene>_<clip>.npy'")
        if pose_dir and os.path.isdir(pose_dir):
            # Mask must cover every frame index the poses reference.
            for pj in os.listdir(pose_dir):
                if not pj.endswith(".json"):
                    continue
                s, c = pj.split("_")[:2]
                if int(s) == scene and int(c.split(".")[0]) == clip:
                    with open(os.path.join(pose_dir, pj)) as f:
                        clipj = json.load(f)
                    max_frame = max(
                        (int(fid) for fr in clipj.values() for fid in fr),
                        default=0,
                    )
                    if max_frame > arr.shape[0]:
                        raise Problem(
                            f"{fn}: mask has {arr.shape[0]} frames but "
                            f"{pj} references frame {max_frame}"
                        )
                    break
    return len(npys)


def check_robust_root(d: str) -> int:
    csvs = []
    for base, _, files in os.walk(d):
        csvs += [os.path.join(base, f) for f in files if f.endswith(".csv")]
    if not csvs:
        raise Problem(f"no Morais-format CSVs under {d}")
    with open(csvs[0]) as f:
        first = f.readline().strip()
    ncols = len(first.split(","))
    if ncols < 3:
        raise Problem(
            f"{csvs[0]}: expected 'frame,x0,y0,...' trajectory rows, got "
            f"{ncols} columns"
        )
    return len(csvs)


def emit_config(template: str, out: str, root: str, dataset: str,
                robust_root: str | None, smoke: bool) -> None:
    with open(template) as f:
        cfg = yaml.safe_load(f)
    cfg["data_dir"] = os.path.abspath(root)
    cfg["dataset_choice"] = dataset
    cfg["test_path"] = os.path.join(
        os.path.abspath(root), "testing", "test_frame_mask"
    )
    if robust_root:
        cfg["dataset_path_to_robust"] = os.path.abspath(robust_root)
    elif cfg.get("dataset_normalization_strategy") == "robust" and not (
        cfg.get("dataset_path_to_robust")
        and os.path.isdir(str(cfg["dataset_path_to_robust"]))
    ):
        # No robust CSVs: fall back to the AlphaPose path with the robust
        # scaler fitted on the fly (cli/common.py:47-56) rather than
        # emitting a config that cannot load.
        cfg["dataset_path_to_robust"] = ""
    if smoke:
        cfg["debug"] = True  # 5 clips, epochs capped at 10
    with open(out, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    _say(f"wrote {out}" + (" (smoke mode: debug: true)" if smoke else ""))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--root", required=True, help="dataset root directory")
    ap.add_argument("--dataset", required=True, choices=sorted(POSE_SPLITS))
    ap.add_argument("--robust-root", default=None,
                    help="Morais CSV root (enables the robust pipeline)")
    ap.add_argument("--template", default=None,
                    help="config YAML to fill in (default: the shipped "
                    "euclidean encoder config for --dataset)")
    ap.add_argument("--out-config", default=None,
                    help="where to write the filled-in config")
    ap.add_argument("--arrange", action="store_true",
                    help="apply layout fixes (symlink pose/ indirection); "
                    "default is report-only")
    ap.add_argument("--smoke", action="store_true",
                    help="emit the config with debug: true (5 clips, "
                    "<=10 epochs) for a first-contact sanity run")
    args = ap.parse_args(argv)

    splits = POSE_SPLITS[args.dataset]
    problems = []
    arrange_pose_dir(args.root, splits, apply=args.arrange)

    for split in splits:
        d = os.path.join(args.root, "pose", split)
        try:
            n, v = check_pose_split(d)
            _say(f"pose/{split}: {n} clips, {v} joints — OK")
        except Problem as e:
            problems.append(str(e))

    gt = os.path.join(args.root, "testing", "test_frame_mask")
    try:
        n = check_gt_dir(gt, os.path.join(args.root, "pose", "testing"))
        _say(f"testing/test_frame_mask: {n} masks — OK")
    except Problem as e:
        problems.append(str(e))

    if "validating" in splits:
        vgt = os.path.join(args.root, "validating", "test_frame_mask")
        try:
            n = check_gt_dir(vgt)
            _say(f"validating/test_frame_mask: {n} masks — OK")
        except Problem as e:
            problems.append(str(e))

    hr = os.path.join(args.root, "hr_bool_masks", "testing",
                      "test_frame_mask")
    if os.path.isdir(hr):
        _say(f"hr_bool_masks: present ({len(os.listdir(hr))} masks) — "
             "`use_hr: true` available")
    else:
        _say("hr_bool_masks: absent — eval runs on the full (non-HR) split")

    if args.robust_root:
        try:
            n = check_robust_root(args.robust_root)
            _say(f"robust CSVs: {n} files — OK")
        except Problem as e:
            problems.append(str(e))

    if problems:
        for p in problems:
            _say(f"PROBLEM: {p}")
        _say("layout invalid; nothing written")
        return 1

    if args.out_config:
        # Only HR-Avenue / HR-STC / UBnormal config dirs ship; the non-HR
        # names are valid --dataset choices (they share the HR layout) but
        # must borrow the HR template.
        tdir = ("UBnormal" if "UBnormal" in args.dataset
                else "HR-Avenue" if "Avenue" in args.dataset
                else "HR-STC")
        template = args.template or os.path.join(
            os.path.dirname(__file__), "..", "config", tdir,
            "euclidean_encoder.yaml",
        )
        if not os.path.isfile(template):
            _say(f"PROBLEM: config template not found: {template}")
            return 1
        emit_config(template, args.out_config, args.root, args.dataset,
                    args.robust_root, args.smoke)
        _say("next: python -m coskad_tpu.cli.train --config "
             f"{args.out_config}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
