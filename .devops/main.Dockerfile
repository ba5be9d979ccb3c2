# Runtime image: generate CLI only (the reference's .devops/main.Dockerfile).
FROM python:3.12-slim AS build
RUN apt-get update && apt-get install -y --no-install-recommends g++ make && \
    rm -rf /var/lib/apt/lists/*
WORKDIR /app
COPY native/ native/
RUN make -C native

FROM python:3.12-slim
WORKDIR /app
# On a TPU VM swap this for the matching libtpu wheel:
#   pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir "jax[cpu]" numpy
COPY llamavk_tpu/ llamavk_tpu/
COPY --from=build /app/native/ native/
COPY prompts/ prompts/
ENV PYTHONPATH=/app
ENTRYPOINT ["python", "-m", "llamavk_tpu.cli.generate"]
