#ifndef GM_STUB_BOOST_IARCH
#define GM_STUB_BOOST_IARCH
#include <boost/archive/binary_oarchive.hpp>
#endif
