"""NExT-QA video feature extraction entry point.

Produces ``vid_feat/app_mot_{mode}.h5`` (the artifact the reference
only consumes — nextqa/nextqa_data.py:127-133) from a directory of
videos / frame directories / .npy clips, using the in-house ResNet-101
backbone: appearance = pooled res5 per sampled frame; motion = the
Kinetics 3D-ResNeXt-101 (vision/resnext3d.py) when ``--motion_weights``
points at the published ``resnext-101-kinetics.pth`` (or an npz of the
converted pytree), else a TSN-style RGB-difference fallback through the
2D backbone (vision/video.py documents the approximation).

    python -m vqacl_tpu.cli.extract_video_features \
        --videos /path/to/clips --out vid_feat/app_mot_train.h5 \
        --weights frcnn_vg.npz --motion_weights resnext-101-kinetics.pth
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
    p.add_argument("--motion_weights", default=None,
                   help="Kinetics 3D-ResNeXt-101 weights for the motion "
                        "half: the published resnext-101-kinetics.pth or "
                        "an npz of the converted pytree (RGB-diff "
                        "fallback if unset)")
    p.add_argument("--motion_side", type=int, default=112,
                   help="square clip resolution fed to the 3D backbone")
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

    motion_params = None
    if args.motion_weights:
        if args.motion_weights.endswith(".npz"):
            motion_params = load_npz_params(args.motion_weights)
        else:
            from vqacl_tpu.vision.resnext3d import load_torch_checkpoint
            motion_params = load_torch_checkpoint(args.motion_weights)

    sources = video.enumerate_video_sources(args.videos)
    print(f"extracting {len(sources)} videos -> {args.out}", flush=True)
    video.extract_videos(params, sources, out_h5=args.out,
                         side=args.side, verbose=True,
                         motion_params=motion_params,
                         motion_side=args.motion_side)
    print("done", flush=True)


if __name__ == "__main__":
    main()
