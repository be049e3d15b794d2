"""Host IO: image/video collection, frame splitting, result persistence.

Counterparts of the reference's IO helpers (acr/utils.py:110-141,
1393-1448; acr/main.py:177-192) built on cv2 only.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import numpy as np

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".tif", ".tiff")


def collect_image_list(image_folder: str) -> List[str]:
    """Recursively collect images; numeric-name sort when possible."""
    files = []
    for root, _dirs, names in os.walk(image_folder):
        for n in names:
            if n.lower().endswith(IMG_EXTS):
                files.append(os.path.join(root, n))
    try:
        files = sorted(files,
                       key=lambda x: int(os.path.basename(x).split(".")[0]))
    except ValueError:
        files = sorted(files)
    return files


def split_frame(videopath: str, out_dir: Optional[str] = None) -> str:
    """Decode a video into numbered jpgs (reference: acr/utils.py:1393-1430)."""
    import cv2
    if not os.path.exists(videopath):
        raise FileNotFoundError(videopath)
    path = out_dir or os.path.splitext(videopath)[0]
    os.makedirs(path, exist_ok=True)
    vc = cv2.VideoCapture(videopath)
    idx = 0
    while True:
        ok, frame = vc.read()
        if not ok:
            break
        cv2.imwrite(os.path.join(path, f"{idx:06d}.jpg"), frame)
        idx += 1
    vc.release()
    return path


def save_video(frames_dir: str, out_name: str, fps: int = 30) -> str:
    """Re-encode a directory of frames to mp4 (reference: utils.py:1432-1448)."""
    import cv2
    names = sorted(os.listdir(frames_dir),
                   key=lambda x: int(x.split(".")[0]) if x.split(".")[0].isdigit() else x)
    names = [n for n in names if n.lower().endswith(IMG_EXTS)]
    if not names:
        raise ValueError(f"no frames in {frames_dir}")
    first = cv2.imread(os.path.join(frames_dir, names[0]))
    h, w = first.shape[:2]
    out_path = out_name if out_name.endswith(".mp4") else out_name + ".mp4"
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    for n in names:
        img = cv2.imread(os.path.join(frames_dir, n))
        if img.shape[:2] != (h, w):
            img = cv2.resize(img, (w, h))
        writer.write(img)
    writer.release()
    return out_path


def save_results(tag: str, output_dir: str, results_dict: Dict) -> str:
    """Persist results as pickle (reference: acr/utils.py:124-129)."""
    os.makedirs(output_dir, exist_ok=True)
    out = os.path.join(output_dir,
                       os.path.basename(tag.rstrip("/")) + "_results.pkl")
    with open(out, "wb") as f:
        pickle.dump(results_dict, f)
    return out


def save_npz_results(path: str, results_dict: Dict) -> str:
    np.savez(path, results=np.asarray([results_dict], dtype=object),
             allow_pickle=True)
    return path
