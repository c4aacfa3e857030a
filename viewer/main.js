// tinysplat-tpu live viewer client.
//
// Original dependency-free implementation of the reference viewer protocol
// (ws JSON: cameraInfo / renderRequest out, {image: base64-jpeg} in): no
// three.js, just a tiny quaternion helper and the Pointer Lock API.

const WS_URL = `ws://${location.hostname || "localhost"}:8765`;
const socket = new WebSocket(WS_URL);

// ---- minimal quaternion math (x, y, z, w layout, three.js convention) ------
const qMul = (a, b) => [
  a[3] * b[0] + a[0] * b[3] + a[1] * b[2] - a[2] * b[1],
  a[3] * b[1] - a[0] * b[2] + a[1] * b[3] + a[2] * b[0],
  a[3] * b[2] + a[0] * b[1] - a[1] * b[0] + a[2] * b[3],
  a[3] * b[3] - a[0] * b[0] - a[1] * b[1] - a[2] * b[2],
];
const qAxisAngle = (axis, angle) => {
  const s = Math.sin(angle / 2);
  return [axis[0] * s, axis[1] * s, axis[2] * s, Math.cos(angle / 2)];
};
const qRotate = (q, v) => {
  // v' = q v q*
  const u = [q[0], q[1], q[2]];
  const s = q[3];
  const cross = (a, b) => [a[1]*b[2]-a[2]*b[1], a[2]*b[0]-a[0]*b[2], a[0]*b[1]-a[1]*b[0]];
  const dot = (a, b) => a[0]*b[0] + a[1]*b[1] + a[2]*b[2];
  const c1 = cross(u, v);
  const c2 = cross(u, c1);
  return [
    v[0] + 2 * (s * c1[0] + c2[0]),
    v[1] + 2 * (s * c1[1] + c2[1]),
    v[2] + 2 * (s * c1[2] + c2[2]),
  ];
};

// ---- camera state -----------------------------------------------------------
let position = [0, 0, 0];
let yaw = 0, pitch = 0;
const SPEED = 0.05;
const X_FLIP = qAxisAngle([1, 0, 0], Math.PI);

function orientation() {
  // yaw about world -y, pitch about local x (fly-style look controls)
  return qMul(qAxisAngle([0, 1, 0], yaw), qAxisAngle([1, 0, 0], pitch));
}

function sendRenderRequest() {
  if (socket.readyState !== WebSocket.OPEN) return;
  const q = orientation();
  // Same axis-flip correction as the reference client (viewer/main.js:54-55):
  // the server's camera convention is x-flipped relative to screen space.
  const quat = qMul(X_FLIP, q).map((v) => Number(v.toFixed(4)));
  const pos = qRotate(X_FLIP, position).map((v) => Number(v.toFixed(4)));
  socket.send(JSON.stringify({
    type: "renderRequest",
    position: pos,
    quat: quat,
    aspectRatio: innerWidth / innerHeight,
  }));
}

socket.addEventListener("open", () => {
  socket.send(JSON.stringify({
    type: "cameraInfo",
    position,
    quat: orientation(),
    fovX: 60, fovY: 60, near: 0.1, far: 1000,
    aspectRatio: innerWidth / innerHeight,
  }));
});

socket.addEventListener("message", (event) => {
  const data = JSON.parse(event.data);
  if (data.image) {
    document.body.style.backgroundImage = `url(data:image/jpeg;base64,${data.image})`;
  }
});

// ---- input ------------------------------------------------------------------
document.body.addEventListener("click", () => document.body.requestPointerLock());

document.addEventListener("mousemove", (e) => {
  if (document.pointerLockElement !== document.body) return;
  yaw -= e.movementX * 0.002;
  pitch = Math.max(-1.55, Math.min(1.55, pitch - e.movementY * 0.002));
  sendRenderRequest();
});

const MOVES = {
  KeyW: [0, 0, -1], ArrowUp: [0, 0, -1],
  KeyS: [0, 0, 1], ArrowDown: [0, 0, 1],
  KeyA: [-1, 0, 0], ArrowLeft: [-1, 0, 0],
  KeyD: [1, 0, 0], ArrowRight: [1, 0, 0],
  KeyQ: [0, 1, 0],
  KeyE: [0, -1, 0],
};

document.addEventListener("keydown", (e) => {
  const dir = MOVES[e.code];
  if (!dir) return;
  const world = qRotate(orientation(), dir);
  position = position.map((p, i) => p + world[i] * SPEED);
  sendRenderRequest();
});
