from links_tpu.data.datasets import (  # noqa: F401
    MPI_SUBJECTS,
    TEST_SUBJECTS,
    TRAIN_SUBJECTS,
    PoseDataset,
    fit_full_pose_pca,
    fit_part_pca,
    load_h36m,
    load_mpi_inf_3dhp,
)
from links_tpu.data.preprocess import H36M_17_JOINTS, preprocess_h36m_fetch  # noqa: F401
from links_tpu.data.synthetic import generate_poses, write_synthetic_pickle  # noqa: F401
