from flexam_tpu.data.bucket_sampler import (  # noqa: F401
    ASPECT_RATIO_512,
    AspectRatioBucketSampler,
    get_closest_ratio,
)
from flexam_tpu.data.discrete_sampler import DiscreteSampling  # noqa: F401
