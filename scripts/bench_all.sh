#!/bin/sh
# The full measured-performance table from STATUS.md, one bench per line
# (ONE TPU process at a time — run this alone). Each invocation prints
# a single JSON line; fresh compiles after a kernel change take ~7 min
# per config with no output (remote compile cache pays once).
set -e
cd "$(dirname "$0")/.."
python bench.py --obs state                                   # fused state-only
python bench.py --map small_loop                              # object-free RGB
python bench.py                                               # loop_obstacles RGB (driver config)
python bench.py --map loop_pedestrians                        # moving NPCs
python bench.py --map udem1                                   # full town
python bench.py --map zigzag_dists,4way,udem1                 # 3-map stack
python bench.py --grayscale --map small_loop                  # BASELINE config 2
python bench.py --grayscale                                   # grayscale obstacles
python bench.py --map udem1 --size 96 --domain-rand           # BASELINE config 4
python bench.py --width 640 --height 480 --envs 512           # reference-native res
python bench.py --distortion                                  # fisheye obs (baked ray table, ~free since r3)
python bench.py --map bigtown                                 # 18x18 town, 32 objects (clustered plan, r3)
python bench.py --distortion --width 640 --height 480 --envs 512  # fisheye at native res (impossible pre-r3)
python bench.py --grayscale --map udem1 --size 96 --domain-rand   # config-4 headroom probe (grayscale)
python bench.py --map town_dyn_duckiebots                     # scripted bots + walkers (r5: +62% via NPC LOD conds)
python bench.py --map metro                                   # 20x20 town, 44 objects (r5)
python bench.py --map loop_duckies                            # dense duckie ring (r5)
python bench.py --map zigzag_dists,4way,udem1,small_loop,loop_obstacles,s_bend  # 6-map curriculum stack
python bench.py --map bigtown_pedestrians                     # NPCs x clustered town
