"""Physical / map constants of the spatial-intention-maps world.

All values mirror the upstream reference environment (citations are
``file:line`` into jimmyyhwu/spatial-intention-maps) so that policies trained
in this framework see the same world geometry, but everything downstream is
re-derived for a batched, fixed-shape TPU simulator.
"""

import math

# ---------------------------------------------------------------------------
# Room / object geometry (envs.py:24-28)
# ---------------------------------------------------------------------------
WALL_HEIGHT = 0.1
CUBE_WIDTH = 0.044
CUBE_MASS = 0.024  # kg (envs.py:503)
RECEPTACLE_WIDTH = 0.15
WALL_THICKNESS = 1.4  # envs.py:445 (walls are very thick boxes)
ROUNDED_CORNER_WIDTH = 0.1006834873  # envs.py:601

# ---------------------------------------------------------------------------
# Robot geometry (envs.py:803-812)
# ---------------------------------------------------------------------------
ROBOT_HALF_WIDTH = 0.03
ROBOT_BACKPACK_OFFSET = -0.0135
ROBOT_BASE_LENGTH = 0.065           # base class (lifting / rescue)
ROBOT_TOP_LENGTH = 0.057
ROBOT_HEIGHT = 0.07
ROBOT_MASS = 0.180                  # envs.py:1021

# Per-type base lengths (envs.py:1059 pushing +5 mm blade, envs.py:1279
# throwing +6 mm offset).
PUSHING_BASE_LENGTH = ROBOT_BASE_LENGTH + 0.005
THROWING_BASE_LENGTH = ROBOT_BASE_LENGTH + 0.006

END_EFFECTOR_THICKNESS = 0.008      # envs.py:1092
END_EFFECTOR_GAP_SIZE = 0.001       # envs.py:1093
END_EFFECTOR_DIST_THRESHOLD = CUBE_WIDTH  # envs.py:1091 (ray test reach)

LIFTED_CUBE_HEIGHT = 0.04           # envs.py:1169
LIFTED_CUBE_OFFSET = -0.007         # envs.py:1170


def end_effector_location(base_length: float) -> float:
    """END_EFFECTOR_LOCATION = BACKPACK_OFFSET + BASE_LENGTH (envs.py:807)."""
    return ROBOT_BACKPACK_OFFSET + base_length


def robot_radius(base_length: float) -> float:
    """RADIUS = sqrt(HALF_WIDTH^2 + END_EFFECTOR_LOCATION^2) (envs.py:808)."""
    ee = end_effector_location(base_length)
    return math.sqrt(ROBOT_HALF_WIDTH ** 2 + ee ** 2)


# Robot type registry.  Order is the integer type code used device-side.
ROBOT_TYPES = ("lifting_robot", "pushing_robot", "throwing_robot", "rescue_robot")
LIFTING, PUSHING, THROWING, RESCUE = 0, 1, 2, 3

ROBOT_BASE_LENGTHS = {
    "lifting_robot": ROBOT_BASE_LENGTH,
    "pushing_robot": PUSHING_BASE_LENGTH,
    "throwing_robot": THROWING_BASE_LENGTH,
    "rescue_robot": ROBOT_BASE_LENGTH,
}
# Number of action-map output channels per type (envs.py:810, 1090).
ROBOT_NUM_OUTPUT_CHANNELS = {
    "lifting_robot": 2,
    "pushing_robot": 1,
    "throwing_robot": 2,
    "rescue_robot": 2,
}
# Whether the type carries the detachable end-effector collision box
# (RobotWithHooks subclasses, envs.py:1089).
ROBOT_HAS_HOOKS = {
    "lifting_robot": True,
    "pushing_robot": False,
    "throwing_robot": True,
    "rescue_robot": True,
}

# ---------------------------------------------------------------------------
# Controller (envs.py:1369-1370, and the calibration note that the constraint
# servo yields exactly 1 mm / 3 deg of actual motion per simulation step)
# ---------------------------------------------------------------------------
DRIVE_STEP_SIZE = 0.005             # constraint-target step per sim step
TURN_STEP_SIZE = math.radians(15)   # constraint-target turn per sim step
DRIVE_SPEED_PER_SIM_STEP = 0.001    # actual body translation per sim step
TURN_SPEED_PER_SIM_STEP = math.radians(3)  # actual body rotation per sim step
NOT_MOVING_POS_EPS = 0.0005         # envs.py:1411 (0.5 mm)
NOT_MOVING_HEADING_EPS = math.radians(1)  # envs.py:1412
STUCK_OSCILLATING_STEPS = 100       # envs.py:1414
STEP_LIMIT_SIM_STEPS = 3200         # envs.py:1422
MAP_UPDATE_EVERY_SIM_STEPS = 200    # envs.py:1400-1402
MANIPULATION_STEPS_DROP = 30        # envs.py:1486
MANIPULATION_STEPS_THROW = 100      # envs.py:1499
SETTLE_MAX_SIM_STEPS = 800          # envs.py:744

SIM_DT = 1.0 / 240.0                # PyBullet default time step
GRAVITY = 9.8                       # envs.py:195

# Throw force model (envs.py:1326-1329): applyExternalForce for one sim step
# => delta-v = F * dt / m.
THROW_FORCE_X_MEAN = 5.5
THROW_FORCE_X_STD = 0.75
THROW_FORCE_Y_MEAN = 1.5
THROW_FORCE_Y_STD = 0.75
THROW_IMPULSE_TO_VELOCITY = SIM_DT / CUBE_MASS

# ---------------------------------------------------------------------------
# Mapper (envs.py:2010-2012)
# ---------------------------------------------------------------------------
LOCAL_MAP_PIXEL_WIDTH = 96
LOCAL_MAP_WIDTH = 1.0  # meters
LOCAL_MAP_PIXELS_PER_METER = LOCAL_MAP_PIXEL_WIDTH / LOCAL_MAP_WIDTH

# Segmentation codes stored in uint8 map grids.  The float segmentation value
# consumed by the network is code / 8 (Camera.SEG_VALUES, envs.py:1880-1889).
SEG_UNSEEN = 0
SEG_FLOOR = 1
SEG_OBSTACLE = 2
SEG_RECEPTACLE = 3
SEG_CUBE = 4
SEG_ROBOT_GROUP_1 = 5  # .. group g -> 5 + g - 1
SEG_DIVISOR = 8.0

# ---------------------------------------------------------------------------
# Cameras (envs.py:1964-2007)
# ---------------------------------------------------------------------------
OVERHEAD_CAMERA_HEIGHT = 1.0
CAMERA_FOV_VERTICAL_DEG = 60.0
# Visible half-width on the floor for the straight-down overhead camera:
# height * tan(FOV/2) (aspect 1, envs.py:1966).
OVERHEAD_VISIBLE_HALF_WIDTH = OVERHEAD_CAMERA_HEIGHT * math.tan(math.radians(30.0))

FORWARD_CAMERA_HEIGHT = ROBOT_HEIGHT
FORWARD_CAMERA_PITCH_DEG = -30.0
FORWARD_CAMERA_OFFSET = ROBOT_BACKPACK_OFFSET + ROBOT_TOP_LENGTH + 0.002  # envs.py:1990
FORWARD_CAMERA_FAR = 1.0
# 60 deg vertical FOV at pitch -30 => ground footprint between
# h*tan(30deg) ahead and the far plane (envs.py:1979-2007).
FORWARD_VISIBLE_MIN_DIST = FORWARD_CAMERA_HEIGHT * math.tan(math.radians(30.0))
FORWARD_VISIBLE_MAX_DIST = math.sqrt(
    max(FORWARD_CAMERA_FAR ** 2 - FORWARD_CAMERA_HEIGHT ** 2, 0.0)
)
FORWARD_CAMERA_HALF_FOV_H = math.radians(45.0)  # 90 deg horizontal FOV

# ---------------------------------------------------------------------------
# Rewards (defaults; envs.py:46-47)
# ---------------------------------------------------------------------------
DEFAULT_SUCCESS_REWARD = 1.0
DEFAULT_PARTIAL_REWARDS_SCALE = 2.0
DEFAULT_POINTLESS_DROP_PENALTY = 0.25
DEFAULT_OBSTACLE_COLLISION_PENALTY = 0.25
DEFAULT_ROBOT_COLLISION_PENALTY = 1.0

# ---------------------------------------------------------------------------
# Fixed-shape capacities of the batched simulator (TPU-side choices; not part
# of the reference).
# ---------------------------------------------------------------------------
MAX_WAYPOINTS = 8           # after line-of-sight simplification
BACKTRACE_MAX_STEPS = 384   # dense steepest-descent path length (pixels)
# Stride bounds the blind-fallback chord at sharp corners: clips stay within
# the robot-radius dilation margin of the configuration space.
BACKTRACE_STRIDE = 4        # subsample stride before LOS simplification
                            # (8 made blind-fallback corner clips deeper
                            # than the cspace dilation margin)
# LOS sample spacing must stay under ~4 px even for jumps spanning the whole
# backtraced path (<= 448 px), or string pulling can clip thin blocked cells.
LOS_SAMPLES = 96            # samples per LOS segment test: <=2.1 px apart
                            # even for chords spanning the whole backtraced
                            # path, so thin blocked cells cannot be skipped
NUM_VIS_RAYS = 112          # FOV raycast rays over the 90 deg wedge
NUM_VIS_STEPS = 64          # raycast samples along each ray (~1.6 px apart)
SPAWN_REJECTION_TRIES = 16  # pose rejection-sampling attempts


def round_up_to_even(x: float) -> int:
    """Mapper.round_up_to_even (envs.py:2405-2406)."""
    return 2 * math.ceil(x / 2)


# Wall band kept inside the global canvas, px.  The reference pads its
# canvas by sqrt(2)*96 px so egocentric crops never leave it
# (envs.py:2382-2388) and fills the padding with its very thick wall boxes
# (envs.py:445).  We keep only a WALL_BAND_PX-wide strip of that wall
# instead: crops are gathered with index clamping, so pixels beyond the
# canvas read the edge cell — which is exactly the wall band (obstacle once
# observed, unseen otherwise) or the unreachable max-fill of a distance
# image, i.e. the same values the reference's padding produces.  This
# shrinks every global-map op (wavefront sweeps, dilations, rasterization)
# ~3-4x and makes W a single 128-lane tile for the standard rooms.
WALL_BAND_PX = 16


def global_map_shape(room_length: float, room_width: float) -> tuple:
    """Compact global map shape: room + wall band (see WALL_BAND_PX)."""
    h = round_up_to_even(room_width * LOCAL_MAP_PIXELS_PER_METER) + 2 * WALL_BAND_PX
    w = round_up_to_even(room_length * LOCAL_MAP_PIXELS_PER_METER) + 2 * WALL_BAND_PX
    return h, w
