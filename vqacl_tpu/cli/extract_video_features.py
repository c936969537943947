"""NExT-QA video feature extraction entry point.

Produces ``vid_feat/app_mot_{mode}.h5`` (the artifact the reference
only consumes — nextqa/nextqa_data.py:127-133) from a directory of
videos / frame directories / .npy clips, using the in-house ResNet-101
backbone: appearance = pooled res5 per sampled frame, motion = TSN-style
RGB-difference stream (vision/video.py documents the approximation vs
upstream's Kinetics 3D-ResNeXt).

    python -m vqacl_tpu.cli.extract_video_features \
        --videos /path/to/clips --out vid_feat/app_mot_train.h5 \
        --weights frcnn_vg.npz
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--videos", required=True,
                   help="directory of per-video frame dirs, video files, "
                        "or .npy [T,H,W,3] clips")
    p.add_argument("--out", required=True, help="output app_mot h5 path")
    p.add_argument("--weights", default=None,
                   help="npz of converted backbone weights (random if "
                        "unset — validation runs only)")
    p.add_argument("--side", type=int, default=224,
                   help="square frame resolution fed to the backbone")
    args = p.parse_args(argv)

    import jax

    from vqacl_tpu.vision import video
    from vqacl_tpu.vision.convert_weights import load_npz_params

    if args.weights:
        params = load_npz_params(args.weights)
    else:
        print("WARNING: no --weights given; using random backbone weights")
        from vqacl_tpu.vision import frcnn
        params = frcnn.init_frcnn(jax.random.PRNGKey(0))

    sources = video.enumerate_video_sources(args.videos)
    print(f"extracting {len(sources)} videos -> {args.out}", flush=True)
    video.extract_videos(params, sources, out_h5=args.out,
                         side=args.side, verbose=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
