#!/bin/bash
# Block until the axon loopback relay accepts connections on :8083 (the
# stateless jax.devices() port; :8082 is the deferred session port).
# The relay is sandbox infrastructure outside this repo — when it is down
# every backend init burns ~25 min before failing UNAVAILABLE (measured,
# 2026-08-17 20:05-23:40 outage). Poll cheaply instead.
until timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8083' 2>/dev/null; do
  sleep 60
done
