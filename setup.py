"""Package install (counterpart of the reference's setup.py)."""

from setuptools import find_packages, setup

setup(
    name="avlen_tpu",
    version="0.1.0",
    description=(
        "TPU-native audio-visual-language embodied navigation framework "
        "(JAX/XLA/Pallas re-design of merlresearch/avlen)"
    ),
    packages=find_packages(include=["avlen_tpu", "avlen_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "numpy", "scipy", "pyyaml"],
    extras_require={"test": ["pytest", "networkx"]},
    include_package_data=True,
    package_data={"avlen_tpu.native": ["*.cpp"]},
)
