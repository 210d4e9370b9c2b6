"""Interactive keyboard demo over the batched env.

Counterpart of scripts/interactive_demo.py in the reference (pygame keyboard
demo over AudioNavRLEnv with audio+video recording). Headless environments
get a terminal REPL: w/a/d to move, s to stop, q to quit; renders the
top-down map as ASCII and optionally records an mp4 with binaural audio.

Usage: python scripts/interactive_demo.py [--record out.mp4]
"""

from __future__ import annotations

import argparse

import numpy as np

from avlen_tpu.config import get_config
from avlen_tpu.core.episodes import pack_episodes
from avlen_tpu.sim.env import BatchedAudioNavEnv, EnvConfig
from avlen_tpu.sim.synthetic import make_episodes, make_scene_bank
from avlen_tpu.utils.maps import draw_top_down_map
from avlen_tpu.utils.video import images_to_video_with_audio

KEYMAP = {"w": 1, "a": 2, "d": 3, "s": 0}


def ascii_map(positions, edges, node, rot, goal, side=18):
    img = draw_top_down_map(positions, edges, node, rot, goal, size=side * 2)
    chars = np.full((side, side), " ")
    small = img[:: max(img.shape[0] // side, 1), :: max(img.shape[1] // side, 1)]
    for y in range(min(side, small.shape[0])):
        for x in range(min(side, small.shape[1])):
            r, g, b = small[y, x]
            if (r, g, b) == (255, 255, 255):
                continue
            if b > 200 and r < 100:
                chars[y, x] = "A"
            elif g > 150 and r < 100:
                chars[y, x] = "G"
            else:
                chars[y, x] = "."
    return "\n".join("".join(row) for row in chars)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--record", default=None)
    args = p.parse_args()

    import jax.numpy as jnp

    bank, tables = make_scene_bank(np.random.RandomState(0), num_scenes=1, side=8)
    eps = make_episodes(np.random.RandomState(1), tables, 8, min_hops=3, max_hops=12)
    packed = pack_episodes(eps, num_envs=1)
    env = BatchedAudioNavEnv(
        bank, packed, EnvConfig(sensors=("spectrogram", "audiogoal", "rgb", "depth", "pose"))
    )
    state, obs = env.reset()
    t = tables[0]
    edges = np.array(
        [[u, v] for u in range(t.num_nodes) for v in t.neighbors[u] if v >= 0], np.int32
    )
    frames, audio_chunks = [], []

    print("Controls: w=forward a=left d=right s=stop q=quit")
    while True:
        node, rot, goal = int(state.node[0]), int(state.rot[0]), int(state.goal_node[0])
        print(ascii_map(t.positions, edges, node, rot, goal))
        print(f"node={node} rot={rot * 90}° goal={goal} dtg={float(state.prev_dtg[0]):.1f}")
        if args.record:
            frames.append(draw_top_down_map(t.positions, edges, node, rot, goal))
            audio_chunks.append(np.asarray(obs["audiogoal"][0]).T)
        key = input("> ").strip().lower()
        if key == "q":
            break
        if key not in KEYMAP:
            continue
        state, out = env.step(state, jnp.asarray([KEYMAP[key]], jnp.int32))
        obs = out.obs
        print(f"reward={float(out.reward[0]):.3f} done={bool(out.done[0])}")
        if bool(out.done[0]):
            print("=== episode finished:", {k: float(v[0]) for k, v in out.metrics.items()})

    if args.record and frames:
        audio = np.concatenate(audio_chunks, axis=0)
        images_to_video_with_audio(args.record, frames, audio, bank.sampling_rate, fps=2)
        print(f"recorded {args.record}")


if __name__ == "__main__":
    main()
