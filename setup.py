from setuptools import find_packages, setup

setup(
    name="multimodalfilter_tpu",
    version="0.1.0",
    description=(
        "TPU-native differentiable multimodal sensor fusion with Bayesian "
        "filters (JAX/XLA/Pallas rebuild of brentyi/multimodalfilter)"
    ),
    packages=find_packages(include=["multimodalfilter_tpu*", "crossmodal*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "numpy",
        "h5py",
    ],
    extras_require={
        "dev": ["pytest", "torch"],
    },
)
