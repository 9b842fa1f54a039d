from . import quaternion, sh, gaussian_math, camera, knn  # noqa: F401
