# ttc runtime image. TPU hosts use the libtpu-enabled JAX wheel; CPU
# fallback works for tests and host-side jobs.
FROM python:3.12-slim

WORKDIR /app

RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir jax

RUN pip install --no-cache-dir \
    flax optax orbax-checkpoint chex einops numpy scipy h5py pandas \
    pyyaml pytest boto3

COPY setup.py pytest.ini ./
COPY ttc/ ttc/
COPY weights/ weights/
COPY tests/ tests/
RUN pip install --no-cache-dir -e .

ENTRYPOINT ["python", "-u", "-m", "ttc.cli.predict_job"]
