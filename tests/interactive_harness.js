// Minimal DOM stub to drive the chart's JS: verifies render, hover
// tooltip resolution, and rangeslider re-render.
const fs = require("fs");
const htmlSrc = fs.readFileSync(process.argv[2], "utf8");
const dataJson = htmlSrc.match(/<script id="data" type="application\/json">(.*?)<\/script>/s)[1];
const js = htmlSrc.match(/<script>\n("use strict";[\s\S]*?)<\/script>/)[1];

function el(id) {
  return {
    id, innerHTML: "", textContent: id === "data" ? dataJson : "",
    style: {}, attrs: {}, listeners: {},
    value: "0", max: "0", min: "0",
    addEventListener(ev, fn) { this.listeners[ev] = fn; },
    setAttribute(k, v) { this.attrs[k] = v; },
    getBoundingClientRect() { return { left: 0, top: 0, width: 760, height: 380 }; },
  };
}
const els = {};
global.document = {
  getElementById(id) {
    if (!els[id]) els[id] = el(id);
    // xhair is created inside SVG innerHTML; return a stub that records
    return els[id];
  },
};
eval(js);
const svg = els["chart"], tip = els["tooltip"], lo = els["lo"], hi = els["hi"];
// 1) initial render drew polylines for both series
const polys = (svg.innerHTML.match(/<polyline/g) || []).length;
console.log("polylines:", polys);
const initial = svg.innerHTML;
// 2) hover at mid-chart → tooltip shows the x label + series values
svg.listeners["mousemove"]({ clientX: 50 + (760 - 65) * 0.5, clientY: 100, pageX: 400, pageY: 100 });
console.log("tooltip:", tip.innerHTML, "| display:", tip.style.display);
// 3) rangeslider: narrow the window → re-render changes the drawing
lo.value = "3"; hi.value = "6";
lo.listeners["input"]();
console.log("rerendered:", svg.innerHTML !== initial);
console.log("window labels:", /2024-01-04/.test(svg.innerHTML) && /2024-01-07/.test(svg.innerHTML));
