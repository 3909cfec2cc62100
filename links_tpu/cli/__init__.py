"""CLI entry points — one per reference script (SURVEY.md §2.9):

    python -m links_tpu.cli.train_full_pose_norm_flow    (stage 1)
    python -m links_tpu.cli.train_part_norm_flows        (stage 2;
        reference name: train_leg_torso_left_right_norm_flow)
    python -m links_tpu.cli.train_left_right_lifter      (stage 3a)
    python -m links_tpu.cli.train_leg_torso_lifter       (stage 3b)
    python -m links_tpu.cli.train_occlusion_models       (stage 4)
    python -m links_tpu.cli.eval_h36m                    (stage 5)
"""
