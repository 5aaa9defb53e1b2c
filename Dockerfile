# Inference/training container for fmc_uia_tpu.
# The reference README promises an "Inference & Docker" section that does
# not exist; this is the real thing. Base image must provide JAX with the
# TPU (or CPU) runtime — e.g. an official jax-tpu image.
ARG BASE_IMAGE=python:3.12-slim
FROM ${BASE_IMAGE}

WORKDIR /app
COPY fmc_uia_tpu/ fmc_uia_tpu/
COPY configs/ configs/
COPY bench.py bench_latency.py README.md ./

# jax[tpu] for TPU hosts; plain jax works for CPU inference
RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    flax optax orbax-checkpoint pandas pyyaml opencv-python-headless \
    scikit-learn matplotlib || pip install --no-cache-dir \
    jax flax optax orbax-checkpoint pandas pyyaml opencv-python-headless \
    scikit-learn matplotlib

# build the native preprocessing library (optional, falls back gracefully)
RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && python -m fmc_uia_tpu.native.build || true \
    && apt-get purge -y g++ && apt-get autoremove -y \
    && rm -rf /var/lib/apt/lists/*

# train:   docker run ... python -m fmc_uia_tpu --config configs/config.yaml
# inference: docker run ... python -m fmc_uia_tpu.predict \
#              --checkpoint /ckpt --data /data --out /preds
# serving: docker run -p 8000:8000 ... --entrypoint python <img> \
#              -m fmc_uia_tpu.serve --checkpoint /ckpt --port 8000
EXPOSE 8000
ENTRYPOINT ["python", "-m", "fmc_uia_tpu.predict"]
