"""Lip/face mask extraction for training data (reference
`lip_mask_extractor.py`: mediapipe FaceMesh lip polygons -> PNG masks).

mediapipe is not in this image; when absent we fall back to an OpenCV
Haar-cascade face detector producing face boxes and a heuristic lower-face
lip region — adequate for mask-weighted-loss training where masks gate loss
emphasis, with a warning pointing at mediapipe for landmark-accurate masks.
"""

from __future__ import annotations

import argparse
import os
import warnings

import numpy as np

# FaceMesh lip landmark rings used when mediapipe is present
UPPER_LIP = [61, 185, 40, 39, 37, 0, 267, 269, 270, 409, 291, 308, 415, 310, 311, 312, 13, 82, 81, 80, 191, 78]
LOWER_LIP = [61, 146, 91, 181, 84, 17, 314, 405, 321, 375, 291, 308, 324, 318, 402, 317, 14, 87, 178, 88, 95, 78]


def extract_lip_masks(frames_dir: str, out_dir: str) -> int:
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    names = sorted(os.listdir(frames_dir))

    try:
        import mediapipe as mp

        mesh = mp.solutions.face_mesh.FaceMesh(
            static_image_mode=True, max_num_faces=1, refine_landmarks=True
        )

        def lip_mask(img):
            h, w = img.shape[:2]
            res = mesh.process(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
            mask = np.zeros((h, w), np.uint8)
            if res.multi_face_landmarks:
                lm = res.multi_face_landmarks[0].landmark
                for ring in (UPPER_LIP, LOWER_LIP):
                    pts = np.array(
                        [[int(lm[i].x * w), int(lm[i].y * h)] for i in ring], np.int32
                    )
                    cv2.fillPoly(mask, [pts], 255)
            return mask

    except ImportError:
        warnings.warn(
            "mediapipe not installed; using Haar-cascade lower-face heuristic "
            "for lip masks"
        )
        cascade = cv2.CascadeClassifier(
            cv2.data.haarcascades + "haarcascade_frontalface_default.xml"
        )

        def lip_mask(img):
            h, w = img.shape[:2]
            mask = np.zeros((h, w), np.uint8)
            gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
            faces = cascade.detectMultiScale(gray, 1.1, 4)
            for (x, y, fw, fh) in faces[:1]:
                # mouth region: lower third of the face box, centered
                my0 = y + int(fh * 0.65)
                my1 = y + int(fh * 0.95)
                mx0 = x + int(fw * 0.25)
                mx1 = x + int(fw * 0.75)
                mask[my0:my1, mx0:mx1] = 255
            return mask

    count = 0
    for n in names:
        img = cv2.imread(os.path.join(frames_dir, n))
        if img is None:
            continue
        cv2.imwrite(os.path.join(out_dir, n), lip_mask(img))
        count += 1
    return count


def main():
    p = argparse.ArgumentParser("lip_mask_extractor")
    p.add_argument("--frames_dir", required=True)
    p.add_argument("--out_dir", required=True)
    a = p.parse_args()
    n = extract_lip_masks(a.frames_dir, a.out_dir)
    print(f"wrote {n} masks to {a.out_dir}")


if __name__ == "__main__":
    main()
